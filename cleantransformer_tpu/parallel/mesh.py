"""Device-mesh management.

The TPU-native replacement for the reference's NCCL process groups
(ft_bloom_DDP.py:183 ``dist.init_process_group``): a single
``jax.sharding.Mesh`` over ICI with named axes

  - ``data``  — data parallelism (replaces DDP / DistributedSampler)
  - ``model`` — tensor parallelism (makes Bloom's ``pretraining_tp`` stub real)

Gradient sync, bucketing, and overlap are handled by the XLA scheduler via
sharding annotations — there is no hand-written all-reduce machinery.
"""

import contextlib
import math

import jax
import numpy as np

_ACTIVE_MESH = None


def compat_shard_map(f, mesh, in_specs, out_specs):
    """shard_map across JAX versions: jax.shard_map (new, check_vma) or
    jax.experimental.shard_map (old, check_rep) — replication checking is
    disabled either way (our bodies mix replicated and sharded operands)."""
    sm = getattr(jax, "shard_map", None)
    if sm is not None:
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    from jax.experimental.shard_map import shard_map as sm_old
    return sm_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up — the jax analogue of
    ``dist.init_process_group("nccl")`` (ft_bloom_DDP.py:183). With no
    arguments, reads the standard JAX coordinator env vars; a no-op on a
    single host without them."""
    import os
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and "COORDINATOR_ADDRESS" not in os.environ:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(data=None, model=1, devices=None):
    """Build a Mesh with ('data', 'model') axes.

    ``data=None`` uses all remaining devices for data parallelism.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"data*model ({data}*{model}) != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return jax.sharding.Mesh(dev_array, ("data", "model"))


def make_named_mesh(devices=None, **axes):
    """Mesh with arbitrary named axes in kwarg order, e.g.
    ``make_named_mesh(data=2, expert=4)`` — for parallelism strategies beyond
    data x model (expert parallelism, sequence/'seq' rings, pipelines)."""
    devices = devices if devices is not None else jax.devices()
    names = tuple(axes)
    sizes = tuple(axes[n] for n in names)
    n = int(np.prod(sizes))
    assert n == len(devices), (
        f"axes {dict(axes)} need {n} devices, got {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return jax.sharding.Mesh(dev_array, names)


def active_mesh():
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh):
    """Activate a mesh for ``shard_hint`` constraints during tracing."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else contextlib.nullcontext():
            yield mesh
    finally:
        _ACTIVE_MESH = prev
