"""Real multi-process `jax.distributed` exercise (new-design component,
SURVEY.md §2.2 — the reference has no distributed layer): two localhost
CPU processes, a shared coordinator, one global 8-device ("data",
"model") mesh, one fully-sharded training step, and loss parity with
the single-process virtual mesh. This is the only distributed surface
`dryrun_multichip` (single process) cannot reach: the coordinator
handshake, multi-controller shard_map execution and cross-process
(Gloo) collectives.

Runs in subprocesses with their own env, so the conftest CPU forcing
does not apply; ~2-3 min wall.
"""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


@pytest.mark.slow
def test_two_process_sharded_step_matches_single_process():
    import multiproc_dist

    ok, outs = multiproc_dist.launch(nproc=2)
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{err[-2000:]}"
    multi_loss = multiproc_dist.parse_loss(outs[0][1])
    ref_loss = multiproc_dist.parse_loss(multiproc_dist.single_process_loss())
    # same mesh shape, same inputs, same reduction order -> bitwise
    assert multi_loss == ref_loss, (multi_loss, ref_loss)
