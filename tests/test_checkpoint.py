import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.core.checkpoint import CheckpointManager
from evoke_tpu.core.loggers import PredictionCSV, append_best_record


class TestCheckpointManager:
    def _state(self, scale=1.0):
        return {
            "params": {"a": jnp.ones((3, 4)) * scale, "nested": {"b": jnp.arange(5.0)}},
            "step": jnp.int32(7),
        }

    def test_save_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        state = self._state(2.0)
        mgr.save("current", state, meta={"epoch": 3, "monitor_best": 0.5})
        target = self._state(0.0)
        restored, meta = mgr.restore("current", target)
        np.testing.assert_allclose(np.asarray(restored["params"]["a"]), 2.0)
        assert int(restored["step"]) == 7
        assert meta == {"epoch": 3, "monitor_best": 0.5}

    def test_best_and_current_slots(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save("current", self._state(1.0))
        mgr.save("best", self._state(9.0))
        assert mgr.exists("current") and mgr.exists("best")
        r, _ = mgr.restore("best", self._state(0.0))
        np.testing.assert_allclose(np.asarray(r["params"]["a"]), 9.0)

    def test_partial_restore_shape_and_key_filtering(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        # stage-1 "pretrain" params: shared key (same shape), mismatched shape, extra key
        source = {"shared": jnp.ones((2, 2)) * 5, "mismatch": jnp.ones((3,)),
                  "only_in_src": jnp.ones((4,))}
        target = {"shared": jnp.zeros((2, 2)), "mismatch": jnp.zeros((7,)),
                  "only_in_tgt": jnp.zeros((2,))}
        merged, report = mgr.partial_restore(source, target)
        np.testing.assert_allclose(np.asarray(merged["shared"]), 5.0)
        np.testing.assert_allclose(np.asarray(merged["mismatch"]), 0.0)  # shape mismatch kept
        np.testing.assert_allclose(np.asarray(merged["only_in_tgt"]), 0.0)
        assert report == {"loaded": 1, "skipped": 2}

    def test_partial_restore_from_saved_trainstate(self, tmp_path):
        """Stage-1 -> Stage-2: restore params subtree from a saved full state."""
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        full = {"params": {"enc": jnp.ones((2,)) * 3, "head": jnp.ones((4,))},
                "opt_state": {"mu": jnp.zeros((2,))}, "step": jnp.int32(1)}
        mgr.save("best", full)
        target_params = {"enc": jnp.zeros((2,)), "decoder": jnp.zeros((6,))}
        merged, report = mgr.partial_restore_from("best", target_params)
        np.testing.assert_allclose(np.asarray(merged["enc"]), 3.0)
        assert report["loaded"] == 1


class TestAsyncCheckpoint:
    """async_save=True: saves overlap the epoch loop; restore waits for the
    in-flight save (round-2 wiring of SURVEY §5.3)."""

    def _state(self, scale=1.0):
        return {"params": {"a": jnp.ones((64, 64)) * scale}, "step": jnp.int32(3)}

    def test_async_save_then_restore(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
        mgr.save("current", self._state(5.0), meta={"epoch": 1, "monitor_best": 0.1})
        # no explicit wait: restore must drain the in-flight save itself
        restored, meta = mgr.restore("current", self._state(0.0))
        np.testing.assert_allclose(np.asarray(restored["params"]["a"]), 5.0)
        assert meta["epoch"] == 1

    def test_async_overlapping_saves_serialize(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
        for i in range(3):  # back-to-back saves: each waits for the previous
            mgr.save("current", self._state(float(i)))
        mgr.wait()
        restored, _ = mgr.restore("current", self._state(0.0))
        np.testing.assert_allclose(np.asarray(restored["params"]["a"]), 2.0)

    def test_trainer_uses_async_by_default(self):
        from evoke_tpu.core.config import EvokeConfig
        assert EvokeConfig().trainer.async_checkpoint is True


class TestDegradedMetricsVisible:
    def test_configured_but_failing_metric_lands_in_output(self):
        from evoke_tpu.core.config import MetricsConfig
        from evoke_tpu.evals.composite import compute_all_scores
        cfg = MetricsConfig(radgraph_checkpoint="/nonexistent/radgraph")
        out = compute_all_scores(["the heart is normal ."], ["the heart is normal ."],
                                 cfg)
        assert "degraded_metrics" in out
        assert "F1-Radgraph" in out["degraded_metrics"]
        assert "BLEU_4" in out  # NLG still computed


class TestCSVContracts:
    def test_prediction_csv_metric_rows_and_epoch_columns(self, tmp_path):
        p = str(tmp_path / "test_prediction.csv")
        csv = PredictionCSV(p)
        csv.update("1", ["img1", "img2"], ["gt one", "gt two"], ["pred a", "pred b"],
                   {"BLEU_4": 0.1, "F1-Radgraph-partial": 0.2})
        csv.update("2", ["img1", "img2"], ["gt one", "gt two"], ["pred c", "pred d"],
                   {"BLEU_4": 0.15, "F1-Radgraph-partial": 0.25})
        metrics = PredictionCSV.read_metrics(p)
        assert metrics["BLEU_4"]["pred_1"] == 0.1
        assert metrics["BLEU_4"]["pred_2"] == 0.15
        import pandas as pd
        df = pd.read_csv(p, dtype=str)
        assert {"pred_1", "pred_2"} <= set(df.columns)
        # metric rows come first
        assert df.iloc[0]["images_id"].startswith("__metric__")

    def test_best_record_append(self, tmp_path):
        p = str(tmp_path / "record.csv")
        append_best_record(p, {"version": "v1", "BLEU_4": 0.14})
        append_best_record(p, {"version": "v2", "BLEU_4": 0.15})
        import pandas as pd
        df = pd.read_csv(p)
        assert len(df) == 2 and set(df["version"]) == {"v1", "v2"}
