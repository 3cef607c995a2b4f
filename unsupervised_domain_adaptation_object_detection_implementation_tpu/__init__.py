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


def _enable_compilation_cache():
    """Persistent XLA compilation cache (off only via
    UDAOD_NO_COMPILE_CACHE=1). Train/eval programs here are tiny to run but
    expensive to compile (tiled NMS, scan-heavy RoI paths — 10-30 min on
    TPU); caching makes reruns and config sweeps near-instant. Counterpart
    of the reference's torch.cuda kernel cache (implicit there, explicit
    for XLA)."""
    import os
    if os.environ.get('UDAOD_NO_COMPILE_CACHE'):
        return
    try:
        import jax
        jax.config.update('jax_compilation_cache_dir',
                          os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                         '/tmp/jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    except Exception:  # pragma: no cover - old jax or read-only fs
        pass


_enable_compilation_cache()
