"""Observability + restartable-run utilities."""
import json

import numpy as np
import jax.numpy as jnp

from ife_tpu.parallel.launcher import ShardManifest, distributed_init
from ife_tpu.utils.logging import get_logger, log_json
from ife_tpu.utils.profiling import StageMetrics, stage_timer


def test_stage_timer_records_and_emits(capsys):
    m = StageMetrics()
    with stage_timer("smooth", voxels=1000, metrics=m, emit=True):
        jnp.ones(16).sum().block_until_ready()
    s = m.summary()
    assert "smooth" in s and s["smooth"]["calls"] == 1
    assert s["smooth"]["seconds"] > 0
    line = capsys.readouterr().err.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["event"] == "stage" and rec["stage"] == "smooth"
    assert rec["voxels_per_sec"] > 0


def test_log_json_shape(capsys):
    log_json("bench", {"value": 1.5})
    rec = json.loads(capsys.readouterr().err.strip())
    assert rec["event"] == "bench" and rec["value"] == 1.5 and "t" in rec


def test_logger_singleton_no_duplicate_handlers():
    a = get_logger("ife.x")
    b = get_logger("ife.x")
    assert a is b and len(a.handlers) == 1


def test_distributed_init_single_process_default(monkeypatch):
    monkeypatch.delenv("IFE_COORDINATOR", raising=False)
    assert distributed_init() == (0, 1)


def test_shard_manifest_restart_cycle(tmp_path):
    man = ShardManifest(str(tmp_path / "run.manifest.json"))
    keys = [f"block_{i}" for i in range(4)]
    assert man.pending(keys) == keys
    out = tmp_path / "block_1.npy"
    np.save(out, np.zeros(3))
    man.mark_done("block_1", str(out))
    man.mark_done("block_3")  # no output file
    assert man.pending(keys) == ["block_0", "block_2"]
    # a manifest entry whose output file vanished is NOT done
    out.unlink()
    assert man.pending(keys) == ["block_0", "block_1", "block_2"]
    man.reset()
    assert man.pending(keys) == keys
