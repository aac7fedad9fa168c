"""True multi-process jax.distributed test: 2 processes x 4 CPU devices
each, one global walker mesh — the reference's MCMCDistributed analogue
(SURVEY §2b) exercised for real, not just scaffolded. Each process runs
the identical sharded smc program; results must agree and match the
known posterior."""

import os
import socket
import subprocess
import sys
import textwrap
import threading

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; repo = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=proc_id)
    import jax.numpy as jnp
    sys.path.insert(0, repo)
    import kissabc_tpu as ka
    from kissabc_tpu.parallel import distributed as dist
    assert jax.device_count() == 8 and len(jax.local_devices()) == 4
    mesh = dist.global_mesh(walker=8)
    info = dist.process_info()
    assert info["process_count"] == 2
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    res = ka.smc(pri, cost, nparticles=256, epstol=0.1, mesh=mesh, key=2)
    assert abs(res.P.mean() - 0.707) < 0.05, res.P
    print(f"RESULT {proc_id} {res.eps:.6f} {res.P.mean():.6f}", flush=True)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smc(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    env = {"PATH": "/usr/bin:/bin", "HOME": "/tmp"}
    import os
    env.update({k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS", "XLA_FLAGS")})
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, REPO],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    # drain both workers concurrently: sequential communicate() can
    # deadlock if the other worker fills its pipe while blocked on a
    # distributed barrier
    results = [None, None]

    def drain(i):
        results[i] = procs[i].communicate(timeout=280)

    threads = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(290)
    outs = []
    for i, p in enumerate(procs):
        out, err = results[i]
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        outs.append([l for l in out.splitlines()
                     if l.startswith("RESULT")][0])
    # both processes computed the identical global result
    assert outs[0].split()[2:] == outs[1].split()[2:], outs
