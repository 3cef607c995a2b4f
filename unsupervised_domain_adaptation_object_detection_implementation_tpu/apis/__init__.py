from .train_state import (TrainState, OptimizerSpec, make_lr_schedule,
                          make_optimizer, create_train_state, make_train_step,
                          frozen_mask, make_gan_train_step,
                          create_gan_train_state, split_params)
from .train import train_detector, init_random_seed
from .test import run_inference, evaluate_dataset, results_from_batch
from .inference import (init_detector, inference_detector,
                        async_inference_detector, show_result)
from .hooks import ema_update, grad_norm, guard_nonfinite_update

__all__ = ['TrainState', 'OptimizerSpec', 'make_lr_schedule',
           'make_optimizer', 'create_train_state', 'make_train_step',
           'frozen_mask', 'make_gan_train_step', 'create_gan_train_state',
           'split_params', 'train_detector', 'init_random_seed',
           'run_inference', 'evaluate_dataset', 'results_from_batch',
           'init_detector', 'inference_detector', 'async_inference_detector',
           'show_result', 'ema_update',
           'grad_norm', 'guard_nonfinite_update']
