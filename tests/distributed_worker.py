"""Worker process for the REAL 2-process distributed test (not collected by
pytest — launched by tests/test_distributed.py::test_two_process_dp_training).

Each worker owns 4 virtual CPU devices; the pair forms an 8-device global
mesh through a localhost coordinator, and drives a real Trainer epoch so the
multi-process paths run for real: ``initialize_distributed`` (coordinator
handshake), ``mesh_mod.replicate`` (process-local replication assembly),
``Trainer._place_batch`` (per-process batch carving +
``global_batch_from_local``), and the psum'd DP train step.

Usage: python tests/distributed_worker.py <pid> <nproc> <port> <outfile>
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outfile = sys.argv[4]
    # REPLACE (not append) any inherited device-count flag: each worker owns
    # exactly 4 virtual devices of the 8-device global mesh.
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ultrasound_modeling_tpu.parallel import distributed as dist_mod

    active = dist_mod.initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid)
    assert active, "multi-process runtime did not come up"
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * 4, len(jax.devices())
    assert len(jax.local_devices()) == 4

    from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401

    losses = run_trainer_epochs(lockstep=True)
    with open(outfile, "w") as fh:
        json.dump({"process_id": pid, "losses": losses,
                   "n_global_devices": len(jax.devices())}, fh)
    # Completion barrier through the COORDINATION SERVICE (not a gloo
    # collective) + explicit shutdown: on a 1-core host the two workers'
    # host threads can skew by minutes, past both the gloo KV 30 s timeout
    # and the exit-time shutdown barrier (both observed).
    _coord_barrier("worker_done")
    jax.distributed.shutdown()


def _coord_barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Barrier via the coordinator's KV service — usable while the hosts
    are arbitrarily skewed, unlike gloo collectives (30 s hard timeout)."""
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier(name, timeout_ms)


def run_trainer_epochs(n_epochs: int = 3, lockstep: bool = False):
    """Build the tiny DP Trainer every process runs identically (same seeds,
    same synthetic data) and return its per-epoch losses.  The single-process
    reference in test_distributed.py calls this SAME function on its own
    8-device runtime, so the comparison is definitionally like-for-like.

    ``lockstep`` (multi-process only): the first executed global program
    triggers gloo cross-process context init, which aborts unless every
    process enqueues within its hard 30 s KV timeout — but on a 1-core host
    the workers' tracing phases serialize, skewing the hosts by minutes
    (measured failure mode).  So each worker AOT-compiles the step, meets
    the others at a coordination-service barrier (which tolerates arbitrary
    skew), and only then executes — the compiled object directly, so no
    re-trace reopens the gap."""
    import dataclasses as dc

    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.data.pipeline import Dataset
    from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
    from ultrasound_modeling_tpu.train.loop import Trainer

    cfg = default_config("resnest_unet")
    cfg = dc.replace(
        cfg,
        model=dc.replace(cfg.model, radix=2, kpaths=2, num_classes=3,
                         in_channels=4, img_size=(32, 32)),
        train=dc.replace(cfg.train, batch_size=8, epochs=3,
                         log_every=10 ** 9, image_every=0,
                         scan_epochs=False),
        data=dc.replace(cfg.data, augment=False))
    ds = Dataset.synthetic(n_train=8, n_test=4, height=32, width=32,
                           n_disp=4)
    mesh = mesh_mod.make_mesh(n_data=8)
    trainer = Trainer(cfg, ds, mesh=mesh)
    if lockstep:
        x, y, _ = ds.next_train(cfg.train.batch_size, fix=True)
        xp, yp = trainer._place_batch(x, y)
        compiled = trainer.train_step.lower(
            trainer.state, xp, yp,
            jnp.float32(trainer.current_lr())).compile()
        trainer.train_step = compiled
        _coord_barrier("step_compiled")
    losses = []
    for epoch in range(1, 1 + n_epochs):
        out = trainer.train_epoch(epoch)
        losses.append(float(out["loss"]))
    return losses


if __name__ == "__main__":
    main()
