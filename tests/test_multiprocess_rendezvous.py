"""Two-process `jax.distributed` rendezvous through the production runner
(VERDICT r4 next #5): the reference's only beyond-single-host capability is
the torchrun --nnodes/--node_rank recipe
(/root/reference/13.interactive_segmentation_training/13.0.encoder_distill_training/dinov3_vit_large_encoder_distill_to_dinov3_vit_small/train.sh:18-40).
Here: 2 localhost CPU processes rendezvous via
`jax.distributed.initialize` (parallel/mesh.py::distributed_init), train
3 dp2 steps through engine/runner.py with per-process loader sharding
(data/loader.py:91) + `make_array_from_process_local_data` batch assembly
(parallel/mesh.py::shard_batch), save a collective orbax checkpoint, and
must produce the SAME loss as a single-process dp2 run of the same
config/seed.
"""

import os
import re
import socket
import subprocess
import sys

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "mp_train_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)
    return env


def _final_metric(stdout, tag):
    m = re.search(r"FINAL_METRIC (-?[\d.]+)", stdout)
    assert m, f"{tag}: no FINAL_METRIC in output:\n{stdout[-3000:]}"
    return float(m.group(1))


def _iter1_loss(work_dir):
    log = os.path.join(work_dir, "log", "train.log")
    with open(log) as f:
        for line in f:
            m = re.search(r"epoch 1 iter 1/\d+ loss ([\d.]+)", line)
            if m:
                return float(m.group(1))
    raise AssertionError(f"no iter-1 loss line in {log}")


def test_two_process_rendezvous_matches_single_process(tmp_path):
    port = _free_port()
    env = _clean_env()

    # --- 2-process dp2: both must run concurrently (they rendezvous) ---
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, CHILD, "--num-processes", "2",
             "--process-id", str(pid), "--port", str(port),
             "--devices", "2", "--work-dir", str(tmp_path / "mp")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env))
    outs = []
    for pid, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=900)
        outs.append(out)
        assert proc.returncode == 0, \
            f"proc {pid} rc={proc.returncode}:\n{out[-3000:]}"
    mp_metric = _final_metric(outs[0], "proc0")
    # the metric is psum'd in the jitted step -> replicated across processes
    assert mp_metric == _final_metric(outs[1], "proc1")

    # --- single-process dp2 baseline: same config, 2 virtual devices ---
    sp = subprocess.run(
        [sys.executable, CHILD, "--num-processes", "1", "--devices", "2",
         "--work-dir", str(tmp_path / "sp")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert sp.returncode == 0, sp.stdout[-3000:]
    sp_metric = _final_metric(sp.stdout, "single")

    # identical global batches + replicated params + same RNG fold: the
    # iter-1 loss (pure forward on identical params+data) must agree to
    # float noise; the 3-step average only to ~1e-3 relative, because
    # gloo-vs-XLA reduction order drifts compound through SGD updates
    mp_it1 = _iter1_loss(tmp_path / "mp")
    sp_it1 = _iter1_loss(tmp_path / "sp")
    assert abs(mp_it1 - sp_it1) < 1e-4, (mp_it1, sp_it1)
    assert abs(mp_metric - sp_metric) < 5e-3 * abs(sp_metric), \
        (mp_metric, sp_metric)
