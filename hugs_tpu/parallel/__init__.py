"""Multi-chip / multi-host parallelism.

Submodules are re-exported LAZILY (PEP 562): multi-process entry code
must be able to `from hugs_tpu.parallel.multihost import init_distributed`
and call it BEFORE anything initializes the XLA backend
(jax.distributed.initialize refuses to run afterwards), and the render
stack's module-level jnp constants would otherwise initialize it right
here at package-import time.
"""
_EXPORTS = {
    "make_mesh": "hugs_tpu.parallel.shard",
    "render_tile_sharded": "hugs_tpu.parallel.shard",
    "batch_render_sharded": "hugs_tpu.parallel.shard",
    "render_gauss_sharded": "hugs_tpu.parallel.gauss_shard",
    "make_gauss_scene_train_step": "hugs_tpu.parallel.gauss_train",
    "shard_scene_state": "hugs_tpu.parallel.gauss_train",
    "init_distributed": "hugs_tpu.parallel.multihost",
    "make_hybrid_mesh": "hugs_tpu.parallel.multihost",
    "global_batch": "hugs_tpu.parallel.multihost",
    "sync_hosts": "hugs_tpu.parallel.multihost",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
