"""TPU-native Unsupervised Domain Adaptation Object Detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the reference
MMDetection-2.19 UDAOD fork (see SURVEY.md): adversarial domain-adaptive
Faster R-CNN variants (DAF, MAF, SWDA, DeepAlign, Tri-attention, CyDA/CyCADA)
plus the supporting detection toolbox, data pipeline, config/registry system
and train/test/inference APIs.

Design (TPU-first, not a port):
- every model is a flax.linen module with static shapes; ragged structures
  (gt lists, proposals, sampled RoIs) are padded tensors with validity masks;
- the whole train step — backbone, RPN, RoI head, all GRL alignment losses,
  optimizer update — is one jit-compiled function, sharded data-parallel over
  a `jax.sharding.Mesh`;
- two-stream (source+target) batching is a data layout: batch rows carry a
  `domain` vector and "source-only" losses are mask multiplies.

Common alias: `import unsupervised_domain_adaptation_object_detection_implementation_tpu as udaod`
"""

from .version import __version__, version_info

__all__ = ['__version__', 'version_info']
