"""Worker process for the multi-process distributed test.

Launched by tests/test_distributed.py as N separate OS processes, each
backed by CPU virtual devices.  Exercises the real multi-controller path
(SURVEY.md section 5: "multi-host over DCN with jax.distributed.initialize"):
every process calls :func:`libsrcnn_tpu.parallel.distributed.initialize`
against a shared coordinator, builds the GLOBAL mesh spanning all
processes' devices, runs the tiled pipeline on a globally-sharded frame,
and checks its own addressable output shards against the single-device
pipeline run locally.

Usage: distributed_worker.py <coordinator> <num_processes> <process_id>
"""

import sys


def main(coordinator: str, num_processes: int, process_id: int) -> int:
    import numpy as np
    import jax

    from libsrcnn_tpu import SRCNNConfig, upscale
    from libsrcnn_tpu.models import srcnn
    from libsrcnn_tpu.parallel import distributed, tiled

    distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_processes,
                           process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    n = jax.device_count()
    assert n == num_processes * jax.local_device_count(), n

    # global mesh over ALL processes' devices; rows split across processes
    # (the DCN boundary sits between row groups)
    mesh = distributed.global_mesh(data=1, row=n // 2, col=2)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    params = srcnn.load_params()
    cfg = SRCNNConfig()

    out, conv = tiled.upscale_tiled(img, params, 2.0, cfg, mesh)

    # single-device reference, computed independently in this process
    ref, refc = upscale(img, 2.0, cfg, return_conv_map=True)

    # each process validates the shards it can address
    for arr, full in ((out, ref), (conv, refc)):
        checked = 0
        for shard in arr.addressable_shards:
            want = full[shard.index]
            got = np.asarray(shard.data)
            if not np.array_equal(got, want):
                print(f"rank {process_id}: shard {shard.index} mismatch",
                      flush=True)
                return 1
            checked += 1
        assert checked == jax.local_device_count(), checked

    # per-process share helper on the same global run
    assert distributed.process_local_batch(2 * num_processes) == 2

    print(f"rank {process_id}: OK ({checked} shards checked, "
          f"{jax.device_count()} global devices)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3])))
