import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.models.finetune import FinetuneModel
from evoke_tpu.models.pretrain import PretrainModel

pytestmark = pytest.mark.slow  # full-model CPU compiles: run via the slow lane


KEY = jax.random.key(0)

SMALL = dict(d_vf=2048, output_dim=64, encoder_hidden_size=32, encoder_num_layers=1,
             encoder_num_heads=2, encoder_intermediate_size=64)


@pytest.fixture(scope="module")
def batch(rng=np.random.default_rng(1)):
    b, hw, t = 4, 64, 12
    return {
        "images": jnp.asarray(rng.normal(size=(b, hw, hw, 3)), jnp.float32),
        "ids": jnp.asarray(rng.integers(1, 30, size=(b, t)), jnp.int32),
        "mask": jnp.ones((b, t), jnp.int32),
        "pids": jnp.asarray([0, 0, 1, 2], jnp.int32),
        "valid": jnp.ones(4, bool),
    }


class TestPretrainModel:
    def test_loss_dict(self, batch):
        model = PretrainModel(vocab_size=30, **SMALL)
        variables = model.init(KEY, batch["images"], batch["ids"], batch["mask"],
                               batch["pids"], batch["valid"])
        out, _ = model.apply(variables, batch["images"], batch["ids"], batch["mask"],
                             batch["pids"], batch["valid"], train=True,
                             mutable=["batch_stats"], rngs={"dropout": KEY})
        assert set(out) == {"multiview_loss", "instance_loss", "sen_text_loss", "all_loss"}
        total = out["multiview_loss"] + out["instance_loss"] + out["sen_text_loss"]
        np.testing.assert_allclose(float(out["all_loss"]), float(total), rtol=1e-5)
        assert all(np.isfinite(float(v)) for v in out.values())

    def test_ablation_mpc_only(self, batch):
        model = PretrainModel(vocab_size=30, pretrain_loss="mpc", **SMALL)
        variables = model.init(KEY, batch["images"], batch["ids"], batch["mask"],
                               batch["pids"], batch["valid"])
        out, _ = model.apply(variables, batch["images"], batch["ids"], batch["mask"],
                             batch["pids"], batch["valid"], train=True,
                             mutable=["batch_stats"], rngs={"dropout": KEY})
        assert float(out["instance_loss"]) == 0.0
        assert float(out["all_loss"]) == float(out["multiview_loss"])


class TestFinetuneModel:
    def _model(self):
        return FinetuneModel(vocab_size=30, d_model=16, d_ff=32, num_heads=2, num_layers=2,
                             rm_num_slots=3, rm_d_model=16, max_seq_len=12,
                             fusion_num_heads=2, fusion_intermediate_size=64,
                             sk_fusion_num_layers=1, drop_prob_lm=0.0, **SMALL)

    def test_train_forward_no_indication(self, batch):
        model = self._model()
        variables = model.init(KEY, batch["images"], batch["ids"], batch["mask"],
                               batch["pids"], batch["valid"])
        out, _ = model.apply(variables, batch["images"], batch["ids"], batch["mask"],
                             batch["pids"], batch["valid"], train=True,
                             mutable=["batch_stats"], rngs={"dropout": KEY})
        assert np.isfinite(float(out["lm"]))
        assert float(out["all_loss"]) == float(out["lm"])

    def test_train_forward_with_indication(self, batch):
        model = self._model()
        inc_ids = batch["ids"][:, :6]
        inc_mask = batch["mask"][:, :6]
        variables = model.init(KEY, batch["images"], batch["ids"], batch["mask"],
                               batch["pids"], batch["valid"], inc_ids, inc_mask)
        out, _ = model.apply(variables, batch["images"], batch["ids"], batch["mask"],
                             batch["pids"], batch["valid"], inc_ids, inc_mask, train=True,
                             mutable=["batch_stats"], rngs={"dropout": KEY})
        assert np.isfinite(float(out["lm"]))

    def test_encode_for_decode_shapes(self, batch):
        model = self._model()
        variables = model.init(KEY, batch["images"], batch["ids"], batch["mask"],
                               batch["pids"], batch["valid"])
        enc, att_mask = model.apply(variables, batch["images"], batch["pids"], batch["valid"],
                                    4, method=model.encode_for_decode)
        assert enc.shape == (4, 4, 16)  # 64px -> 2x2=4 patches, d_model=16
        state = model.apply(variables, enc, 4, method=model.init_decode_state)
        logp, state = model.apply(variables, jnp.zeros(4, jnp.int32), 0, state, att_mask,
                                  method=model.decode_step)
        assert logp.shape == (4, 31)
