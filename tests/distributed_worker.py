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

    losses = run_trainer_epochs()
    with open(outfile, "w") as fh:
        json.dump({"process_id": pid, "losses": losses,
                   "n_global_devices": len(jax.devices())}, fh)


def run_trainer_epochs(n_epochs: int = 3):
    """Build the tiny DP Trainer every process runs identically (same seeds,
    same synthetic data) and return its per-epoch losses.  The single-process
    reference in test_distributed.py calls this SAME function on its own
    8-device runtime, so the comparison is definitionally like-for-like."""
    import dataclasses as dc

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
    losses = []
    for epoch in range(1, 1 + n_epochs):
        out = trainer.train_epoch(epoch)
        losses.append(float(out["loss"]))
    return losses


if __name__ == "__main__":
    main()
