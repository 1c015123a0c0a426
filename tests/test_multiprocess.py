"""Real 2-process jax.distributed validation (VERDICT r3 item 4).

Every other multi-device proof in the suite is ONE process with 8 virtual
CPU devices; this test spawns TWO coordinated processes (2 host devices
each -> a 4-device global mesh) and runs tests/multiproc_worker.py in
both: jax.distributed init from the repo's coordinator env contract
(parallel/distributed.py), per-host file sharding, the sharded train step
with per-host batch assembly, and an orbax save/restore across the
process boundary.

The reference's multi-node story is an untested commented torchrun line
(reference: scripts/train_seed_x_sft_comp_gen.sh:9); this is the
first-party replacement for that gap.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow   # two fresh processes x jax import + compile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_and_checkpoint(tmp_path):
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "PYTHONPATH", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            # PYTHONPATH deliberately drops /root/.axon_site: the TPU plugin
            # connects eagerly at import and would make each worker a second
            # TPU process (CLAUDE.md environment rules)
            PYTHONPATH=REPO,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(tmp_path)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    def line(out, tag):
        hits = [ln for ln in out.splitlines() if ln.startswith(tag)]
        assert len(hits) == 1, (tag, out)
        return hits[0]

    # SPMD: both processes must see identical global metrics at every step,
    # including after the cross-process checkpoint restore
    assert line(outs[0], "METRICS") == line(outs[1], "METRICS")
    ok0 = line(outs[0], "MULTIPROC OK")
    assert ok0 == line(outs[1], "MULTIPROC OK")
    # the checkpoint really landed on disk as one logical artifact
    assert (tmp_path / "ckpts" / "checkpoint_2").exists()
