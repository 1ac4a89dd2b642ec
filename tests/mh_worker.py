"""Multi-host worker for tests/test_multihost.py: one rank of a
2-process jax.distributed CPU run of the sharded seeding path.

Writes the gathered seed rows to <out>.rank<k>.npz for comparison with
the single-process result.
"""
import os
import sys


def main() -> None:
    rank = int(sys.argv[1])
    coord = sys.argv[2]
    out_path = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["GBLASTN_TPU_COORDINATOR"] = coord
    os.environ["GBLASTN_TPU_NUM_PROCESSES"] = "2"
    os.environ["GBLASTN_TPU_PROCESS_ID"] = str(rank)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from gblastn_tpu.parallel.dist import init_distributed

    init_distributed()

    import numpy as np

    from tests.mh_problem import run_problem

    rows = run_problem()
    np.savez(f"{out_path}.rank{rank}.npz", rows=rows)


if __name__ == "__main__":
    main()
