"""Real multi-process `jax.distributed` exercise (VERDICT r3 item 5).

Launches NUM_PROC localhost CPU processes, each owning 8/NUM_PROC
virtual CPU devices; every process calls
`d3ga_tpu.dist.mesh.initialize_distributed` against a shared
coordinator, builds the SAME global ("data", "model") mesh over all 8
devices, and runs ONE fully-sharded training step
(`dist/step_shard.make_sharded_train_step`) on the same tiny synthetic
avatar + batch that `__graft_entry__.dryrun_multichip` uses. Process 0
prints the loss; the launcher asserts it matches the single-process
8-virtual-device dryrun loss bit-for-bit (same mesh shape, same device
count, same inputs -> same reduction order).

This exercises the only distributed surface a single-process virtual
mesh cannot reach: cross-process coordinator handshake, global device
enumeration, multi-controller shard_map execution and cross-process
collectives (new-design component, SURVEY.md §2.2 — the reference has
no distributed layer at all).

Run (launcher): python tools/multiproc_dist.py
Worker mode:    python tools/multiproc_dist.py worker <nproc> <pid> <port>
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DEVICES = 8


def worker(nproc: int, pid: int, port: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEVICES // nproc}"
    )
    sys.path.insert(0, REPO)
    import jax

    # the axon plugin ignores JAX_PLATFORMS env; force CPU via config
    jax.config.update("jax_platforms", "cpu")

    from d3ga_tpu.dist.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == N_DEVICES, jax.device_count()
    assert jax.local_device_count() == N_DEVICES // nproc

    import __graft_entry__

    __graft_entry__.dryrun_multichip(N_DEVICES)
    jax.distributed.shutdown()


def launch(nproc: int = 2, port: int = 12377, timeout: int = 900):
    """Start nproc workers; return process-0 stdout."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(nproc), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    ok = True
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            ok = False
        outs.append((p.returncode, out, err))
        ok = ok and p.returncode == 0
    return ok, outs


def single_process_loss():
    """Reference: the same dryrun on one process with 8 virtual devices."""
    code = (
        "import os, sys; "
        f"sys.path.insert(0, {REPO!r}); "
        "os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '')"
        " + ' --xla_force_host_platform_device_count=8'; "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def parse_loss(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("dryrun_multichip"):
            return float(line.split("loss=")[1].split()[0])
    raise AssertionError(f"no dryrun line in: {out!r}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        sys.exit(0)

    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    ok, outs = launch(nproc)
    for i, (rc, out, err) in enumerate(outs):
        print(f"--- process {i} (rc={rc}) ---")
        print(out.strip() or "(no stdout)")
        if rc != 0:
            print(err[-2000:])
    assert ok, "a worker failed"
    multi_loss = parse_loss(outs[0][1])
    ref = parse_loss(single_process_loss())
    print(f"multi-process loss={multi_loss} single-process loss={ref}")
    assert multi_loss == ref, (multi_loss, ref)
    print(f"MULTIPROC OK: {nproc} processes x {N_DEVICES // nproc} devices, "
          f"loss parity with the single-process virtual mesh")
