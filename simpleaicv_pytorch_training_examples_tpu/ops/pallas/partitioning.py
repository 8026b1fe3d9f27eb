"""SPMD partitioning declarations for the pallas kernels.

Why this exists: under plain `jit` with sharded inputs, XLA's SPMD
partitioners treat a pallas custom-call as an opaque op and REPLICATE it
— every operand is all-gathered to every device and the kernel runs
redundantly (verified on the 8-device CPU mesh: a data-sharded input
came back with `PartitionSpec()`). All kernels in this package are
embarrassingly batch-parallel over axis 0 of every operand and result
(the grids iterate over batch/head blocks), so `axis0_partitioned`
declares exactly that via jax.experimental.custom_partitioning — with
both the GSPMD callbacks and the Shardy einsum-like `sharding_rule`, so
it works under either partitioner.

The wrapped function must derive every grid/block parameter from its
LOCAL operand shapes (it is re-traced with per-shard shapes inside the
partitioner). Compose with jax.custom_vjp OUTSIDE by wrapping the
forward and backward pallas wrappers separately — custom_partitioning
itself has no autodiff rule.
"""

import functools

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

__all__ = ["axis0_partitioned"]


def _axis0_name(arg_infos):
    """The mesh-axis name axis 0 is sharded over, from the first operand
    that has one (None -> replicated execution, still correct)."""
    for a in arg_infos:
        spec = a.sharding.spec
        if len(spec) > 0 and spec[0] is not None:
            return spec[0]
    return None


def _shardings(mesh, ax0, infos):
    return tuple(
        NamedSharding(mesh, PartitionSpec(ax0,
                                          *([None] * (len(i.shape) - 1))))
        for i in infos)


def axis0_partitioned(fn, rule):
    """Declare `fn` batch-parallel over axis 0 of every operand/result.

    fn: pure function, no static args, all array operands/results
        batch-major on axis 0, all internal parameters derived from
        local shapes.
    rule: the Shardy einsum-like rule, e.g. "b n c -> b n k" or
        "g n d, g n d, g n d -> g n d" (factor names are per-dimension;
        only the leading factor is shared across operands/results).
    """
    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ax0 = _axis0_name(arg_infos)
        single = not isinstance(result_infos, (list, tuple))
        infos = [result_infos] if single else result_infos
        outs = _shardings(mesh, ax0, infos)
        return outs[0] if single else tuple(outs)

    def partition(mesh, arg_infos, result_infos):
        ax0 = _axis0_name(arg_infos)
        single = not isinstance(result_infos, (list, tuple))
        infos = [result_infos] if single else result_infos
        out_sh = _shardings(mesh, ax0, infos)
        return (mesh, fn, out_sh[0] if single else tuple(out_sh),
                _shardings(mesh, ax0, arg_infos))

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


@functools.lru_cache(maxsize=None)
def cached_axis0(fn_factory, params, rule):
    """lru-cached wrapper construction: fn_factory(params) -> fn. Call
    sites pass hashable `params` (the static kernel config) so repeated
    traces reuse one custom_partitioning object per config."""
    return axis0_partitioned(fn_factory(params), rule)
