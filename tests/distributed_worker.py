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

    # --- dp/sp-sharded TRAINING step across the process boundary -------
    # the coordinator test's inference half never touched the training
    # subsystem; here the same global mesh runs train_step with the batch
    # dp-sharded over "data" (which spans both processes via "row"...
    # use a data-major mesh so the gradient all-reduce crosses DCN)
    from libsrcnn_tpu.train import trainer as tr
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    tmesh = distributed.global_mesh(data=n // 2, row=2, col=1)
    rng2 = np.random.default_rng(11)
    lr_b = rng2.uniform(0, 255, (8, 24, 24)).astype(np.float32)
    hr_b = rng2.uniform(0, 255, (8, 24, 24)).astype(np.float32)
    opt = optax.adam(1e-4)

    # single-process twin, computed independently in every process
    # (fresh param/opt buffers per call: train_step donates its inputs)
    def local_step():
        p = srcnn.load_params()
        with jax.default_device(jax.local_devices()[0]):
            return tr.train_step(p, opt.init(p),
                                 (jnp.asarray(lr_b), jnp.asarray(hr_b)),
                                 opt, None)

    _, _, loss_local = local_step()
    loss_local = float(loss_local)

    # global dp/sp step: every process feeds the same global batch; JAX
    # shards it over the multi-process mesh (DCN crossing on "data")
    sh = NamedSharding(tmesh, P("data", "row", None))
    batch = tuple(jax.device_put(b, sh) for b in (lr_b, hr_b))
    p_g = jax.device_put(srcnn.load_params(),
                         NamedSharding(tmesh, P()))
    o_g = jax.device_put(opt.init(srcnn.load_params()),
                         NamedSharding(tmesh, P()))
    p_g, o_g, loss_g = tr.train_step(p_g, o_g, batch, opt, tmesh)
    loss_g = float(loss_g)

    if abs(loss_g - loss_local) > 1e-4 * max(1.0, abs(loss_local)):
        print(f"rank {process_id}: train loss mismatch "
              f"{loss_g} vs {loss_local}", flush=True)
        return 1

    # updated params must agree with the local twin (replicated output)
    p_ref, _, _ = local_step()
    w1_g = np.asarray(jax.device_get(p_g["w1"]))
    dw = float(np.abs(w1_g - np.asarray(p_ref["w1"])).max())
    if dw > 1e-6:
        print(f"rank {process_id}: updated w1 drift {dw}", flush=True)
        return 1

    print(f"rank {process_id}: OK-TRAIN loss {loss_g:.2f} "
          f"(local {loss_local:.2f}, w1 drift {dw:.1e})", flush=True)
    print(f"rank {process_id}: OK ({checked} shards checked, "
          f"{jax.device_count()} global devices)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3])))
