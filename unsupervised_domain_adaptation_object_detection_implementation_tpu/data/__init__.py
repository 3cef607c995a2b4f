from .builder import build_dataset, build_dataloader, DataLoader, collate
from . import datasets  # noqa: F401 — registers dataset classes
from . import pipelines  # noqa: F401 — registers transforms

__all__ = ['build_dataset', 'build_dataloader', 'DataLoader', 'collate']
