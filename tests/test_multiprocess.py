"""REAL multi-process tests (round-3 VERDICT item 6): the file-exchange
eval barrier run by two concurrent OS processes sharing a work dir
(including the waiter timing out when a peer dies), and tools/dist_train.sh
executed with NPROC=2 on CPU end to end (jax.distributed rendezvous, gloo
CPU collectives, per-host loader shards assembled into the global batch).

Reference counterparts: mmdet/core/evaluation/eval_hooks.py:18-74 (tmpdir
barrier across ranks) and tools/dist_train.sh:8-9 (torch.distributed.launch
--nproc_per_node).

Unlike tests/test_eval_hook.py (which drives the full hook with
jax.process_index monkeypatched sequentially in ONE process), these tests
give the barrier genuine concurrency: separate interpreters, real polling,
real atomic-rename visibility.
"""

import os
import pickle
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BARRIER_CHILD = textwrap.dedent("""
    import os, pickle, sys, time
    sys.path.insert(0, {repo!r})
    from vps_tpu.train.eval_hook import file_exchange_gather

    host = int(sys.argv[1])
    work = sys.argv[2]
    delay = float(sys.argv[3])
    time.sleep(delay)  # stagger publication: host 0 must genuinely WAIT
    results = {{f"h{{host}}_frame{{i}}": {{"num_keep": host * 10 + i}}
               for i in range(3)}}
    merged = file_exchange_gather(work, epoch=1, results=results, host=host,
                                  n_hosts=2, barrier_timeout=60.0,
                                  poll_interval=0.05)
    with open(os.path.join(work, f"merged.host{{host}}.pkl"), "wb") as f:
        pickle.dump(merged, f)
""").format(repo=REPO)


def _cpu_env(device_count=1):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={device_count}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def test_eval_barrier_two_concurrent_processes(tmp_path):
    """Host 0 starts FIRST and must poll until the slow host 1 publishes;
    merge contains both hosts' results; host 1 gets {}."""
    work = str(tmp_path)
    procs = [
        subprocess.Popen([sys.executable, "-c", BARRIER_CHILD, str(h), work,
                          {0: "0.0", 1: "1.5"}[h]],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for h in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-2000:]

    with open(os.path.join(work, "merged.host0.pkl"), "rb") as f:
        merged = pickle.load(f)
    with open(os.path.join(work, "merged.host1.pkl"), "rb") as f:
        other = pickle.load(f)
    assert other == {}
    assert sorted(merged) == sorted(
        [f"h{h}_frame{i}" for h in (0, 1) for i in range(3)])
    assert merged["h1_frame2"] == {"num_keep": 12}


def test_eval_barrier_times_out_when_peer_dies(tmp_path):
    """A dead rank must surface as TimeoutError, not hang training."""
    from vps_tpu.train.eval_hook import file_exchange_gather

    with pytest.raises(TimeoutError, match="host1"):
        file_exchange_gather(str(tmp_path), epoch=3, results={"a": 1},
                             host=0, n_hosts=2, barrier_timeout=1.0,
                             poll_interval=0.05)


def test_eval_barrier_partial_file_is_not_visible(tmp_path):
    """A crashed writer's partial .tmp file must never be read: only the
    atomic rename publishes. Host 0 times out rather than unpickling it."""
    from vps_tpu.train.eval_hook import file_exchange_gather

    tmpdir = os.path.join(str(tmp_path), ".eval_hook")
    os.makedirs(tmpdir)
    with open(os.path.join(tmpdir, "epoch5.host1.pkl.tmp"), "wb") as f:
        f.write(b"partial garbage")
    with pytest.raises(TimeoutError):
        file_exchange_gather(str(tmp_path), epoch=5, results={}, host=0,
                             n_hosts=2, barrier_timeout=0.5,
                             poll_interval=0.05)


@pytest.mark.cli
@pytest.mark.slow
def test_dist_train_sh_two_process_cpu(tmp_path):
    """tools/dist_train.sh NPROC=2 end to end on CPU: 2 interpreters
    rendezvous through jax.distributed, each loads its host shard, the
    global batch assembles over the 2-device mesh, and one epoch of real
    training completes with a host-0 checkpoint."""
    from test_dataset_files import _write_fixture, H, W
    from test_cli_train_eval import CONFIG_TMPL

    ann_file, img_dir, seg_dir = _write_fixture(str(tmp_path))
    work = str(tmp_path / "work")
    cfg_path = str(tmp_path / "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TMPL.format(W=W, H=H, ann=ann_file, img=img_dir,
                                   seg=seg_dir, work=work))

    env = _cpu_env(device_count=1)
    env["NPROC"] = "2"
    r = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "dist_train.sh"), cfg_path],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + "\n" + r.stderr[-3000:]

    with open(os.path.join(work, "latest.txt")) as f:
        ckpt = os.path.join(work, f.read().strip())
    assert os.path.exists(ckpt), os.listdir(work)
    log = open(os.path.join(work, "train.log")).read()
    assert "hosts=2" in log, log[-2000:]
    assert "Epoch [1]" in log
