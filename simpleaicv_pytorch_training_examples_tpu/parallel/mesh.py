"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's torchrun+NCCL DDP bootstrap
(/root/reference/tools/train_classification_model.py:48-53 and
tools/utils.py:193-197).

Design (scaling-book recipe): one logical mesh with a ``data`` axis for
batch sharding (the reference's only parallelism) and an optional ``model``
axis reserved for tensor-sharding large encoders (SAM ViT-H). Gradients
all-reduce automatically because the loss is a mean over the batch-sharded
axis under jit — XLA inserts the psum over ICI; no DDP bucketing, no manual
all_reduce, no per-iteration barrier (SPMD is implicitly synchronous).

Multi-host: `distributed_init()` wraps `jax.distributed.initialize()` —
the replacement for torchrun's env:// rendezvous + NCCL_SOCKET_IFNAME
(/root/reference/13.interactive_segmentation_training/.../train.sh:18-40).
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init() -> None:
    """Multi-process JAX bootstrap (no-op single-process).

    Controlled by the standard JAX coordinator env vars; replaces the
    reference's `init_process_group('nccl', init_method='env://')`
    (torchrun env:// rendezvous, multi-node train.sh:18-40). When
    JAX_NUM_PROCESSES/JAX_PROCESS_ID are set they are passed explicitly
    (localhost CPU rendezvous, exercised by
    tests/test_multiprocess_rendezvous.py); otherwise initialize()
    autodetects from the cluster environment (TPU pod metadata, SLURM)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def build_mesh(data_parallel_size: int = -1,
               model_parallel_size: int = 1,
               devices=None) -> Mesh:
    """Build a (data, model) mesh over all addressable devices.

    data_parallel_size=-1 uses every device not consumed by model axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel_size == 0
    if data_parallel_size == -1:
        data_parallel_size = n // model_parallel_size
    assert data_parallel_size * model_parallel_size == n, (
        f"{data_parallel_size}x{model_parallel_size} != {n} devices")
    dev_array = np.asarray(devices).reshape(data_parallel_size,
                                            model_parallel_size)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis (inputs/labels)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, opt state)."""
    return NamedSharding(mesh, P())


def zero1_opt_state_sharding(opt_state, mesh: Mesh):
    """ZeRO-1 sharding pytree for an optax state: every moment tensor is
    sharded over the `data` axis on its first divisible dimension, small
    or indivisible leaves stay replicated.

    Beyond the reference's DP (it replicates optimizer state per GPU like
    any DDP setup): with Adam-class optimizers the two moment trees are
    2x the model size — sharding them cuts per-chip optimizer memory by
    the data-parallel degree. Under jit the update math runs sharded and
    XLA inserts the (ICI) all-gather of the parameter updates — exactly
    the ZeRO-1 collective schedule, derived by SPMD propagation from this
    one constraint.
    """
    n_dp = mesh.shape["data"]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        # preserve an existing tensor-parallel ("model") sharding on the
        # moment (optax zeros_like inherits the param's sharding) and add
        # the data axis on another divisible dim
        existing = [None] * len(shape)
        shard = getattr(leaf, "sharding", None)
        if isinstance(shard, NamedSharding):
            for ax, part in enumerate(shard.spec):
                existing[ax] = part
        for ax, s in enumerate(shape):
            if existing[ax] is None and s >= n_dp and s % n_dp == 0:
                parts = list(existing)
                parts[ax] = "data"
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P(*existing))

    return jax.tree.map(spec, opt_state)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with batch-dim sharding.

    The TPU replacement for the reference's per-rank `.cuda()` H2D copy
    (tools/scripts.py:143): one global array per field, sharded over `data`.

    Multi-process: the loader hands each process only ITS slice of the
    global batch (DistributedSampler semantics, data/loader.py:91), so the
    global array is assembled from process-local shards — device_put with
    a cross-process sharding would need the full global value on every
    host. Process p's loader slice lands on process p's devices because
    build_mesh lays `jax.devices()` out in process order.
    """
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad every array's leading dim up to a multiple (for even sharding of
    final partial eval batches); returns (padded_batch, real_count)."""
    import numpy as np

    def leading(x):
        return x.shape[0]

    sizes = {leading(x) for x in jax.tree.leaves(batch)}
    assert len(sizes) == 1, "ragged batch"
    n = sizes.pop()
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return batch, n

    def pad(x):
        pad_width = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width)

    return jax.tree.map(pad, batch), n
