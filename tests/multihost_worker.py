"""Worker script for test_multihost.py: one process of a simulated
2-process (4-device) job.  Validates hdk_tpu.parallel.mesh's
multi-host path — jax.distributed.initialize membership, a global mesh
over all hosts' devices, and a distributed group-by whose psum crosses
the process boundary (SURVEY.md §2.8; the reference is single-node)."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    from hdk_tpu.parallel import mesh as pmesh

    pmesh.init_distributed(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = pmesh.make_mesh()
    ndev = mesh.devices.size
    assert ndev == 4, ndev

    from hdk_tpu.exec.groupby import AggSpec, PerfectHashLayout
    from hdk_tpu.exec.masked import MaskedCol
    from hdk_tpu.ir.expr import AggKind
    from hdk_tpu import types as t
    from hdk_tpu.parallel.dist_groupby import dist_groupby_perfect

    # rows 0..15 split across processes (8 local each); key = row % 4
    local = np.arange(8, dtype=np.int64) + pid * 8
    sharding = NamedSharding(mesh, P(pmesh.FRAG_AXIS))
    rows = jax.make_array_from_process_local_data(sharding, local)
    keys = [MaskedCol(rows % 4, None)]
    vals = MaskedCol(rows, None)
    layout = PerfectHashLayout([0], [4], [False])
    specs = [AggSpec(AggKind.COUNT, None, t.int64(False)),
             AggSpec(AggKind.SUM, vals, t.int64())]
    key_cols, agg_cols, exists = dist_groupby_perfect(
        mesh, keys, layout, specs)
    counts = np.asarray(agg_cols[0].data.addressable_data(0))
    sums = np.asarray(agg_cols[1].data.addressable_data(0))
    assert counts.tolist() == [4, 4, 4, 4], counts
    # sum of 0..15 grouped by mod 4: k + (k+4) + (k+8) + (k+12) = 4k+24
    assert sums.tolist() == [24, 28, 32, 36], sums
    print(f"proc{pid} OK", flush=True)


if __name__ == "__main__":
    main()
