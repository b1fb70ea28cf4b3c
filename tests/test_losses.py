import jax
import jax.numpy as jnp
import numpy as np

from evoke_tpu.core.mesh import MeshSpec, create_mesh, shard_batch
from evoke_tpu.losses.contrastive import (global_alignment_loss, local_token_alignment_loss,
                                          multi_positive_image_loss)
from evoke_tpu.losses.lm import lm_loss


def naive_softmax_ce(logits, targets):
    """-sum(targets * log_softmax(logits)) per row, mean (torch F.cross_entropy w/ soft targets)."""
    logits = logits - logits.max(-1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return float((-(targets * logp).sum(-1)).mean())


class TestMultiPositiveImageLoss:
    def _naive(self, embed, pids, temp):
        """The reference algorithm, literally (filter rows/cols, renorm, CE)."""
        labels = (pids[:, None] == pids[None, :]).astype(float)
        np.fill_diagonal(labels, 0.0)
        idx = np.where(labels.sum(1) != 0)[0]
        if len(idx) == 0:
            return 0.0
        e = embed[idx]
        labels = labels[idx][:, idx]
        labels = labels / labels.sum(1, keepdims=True)
        e = e / np.linalg.norm(e, axis=-1, keepdims=True)
        logits = e @ e.T / temp
        np.fill_diagonal(logits, -1e9)
        logits = logits - logits.max(-1, keepdims=True)
        return naive_softmax_ce(logits, labels)

    def test_matches_reference_math(self, rng):
        embed = rng.normal(size=(6, 8)).astype(np.float32)
        pids = np.array([0, 0, 1, 2, 2, 3])
        got = multi_positive_image_loss(jnp.asarray(embed), jnp.asarray(pids),
                                        jnp.ones(6, bool), 0.5)
        want = self._naive(embed, pids, 0.5)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)

    def test_no_pairs_returns_zero(self, rng):
        embed = rng.normal(size=(4, 8)).astype(np.float32)
        pids = np.array([0, 1, 2, 3])
        got = multi_positive_image_loss(jnp.asarray(embed), jnp.asarray(pids),
                                        jnp.ones(4, bool), 0.5)
        assert float(got) == 0.0

    def test_padding_rows_ignored(self, rng):
        embed = rng.normal(size=(6, 8)).astype(np.float32)
        pids = np.array([0, 0, 1, 1, 7, 7])
        valid = np.array([True] * 4 + [False] * 2)
        got = multi_positive_image_loss(jnp.asarray(embed), jnp.asarray(pids),
                                        jnp.asarray(valid), 0.5)
        want = self._naive(embed[:4], pids[:4], 0.5)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)


class TestGlobalAlignment:
    def _naive(self, img, txt, pids, temp):
        labels = (pids[:, None] == pids[None, :]).astype(float)
        labels = labels / labels.sum(1, keepdims=True)
        img = img / np.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
        l1 = naive_softmax_ce(img @ txt.T / temp, labels)
        l2 = naive_softmax_ce(txt @ img.T / temp, labels)
        return (l1 + l2) / 2

    def test_matches_reference_math(self, rng):
        img = rng.normal(size=(5, 8)).astype(np.float32)
        txt = rng.normal(size=(5, 8)).astype(np.float32)
        pids = np.array([0, 0, 1, 2, 2])
        got = global_alignment_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(pids),
                                    jnp.ones(5, bool), 0.5)
        np.testing.assert_allclose(float(got), self._naive(img, txt, pids, 0.5), rtol=1e-4)

    def test_padding_rows_ignored(self, rng):
        img = rng.normal(size=(6, 8)).astype(np.float32)
        txt = rng.normal(size=(6, 8)).astype(np.float32)
        pids = np.array([0, 0, 1, 1, 9, 9])
        valid = np.array([True] * 4 + [False] * 2)
        got = global_alignment_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(pids),
                                    jnp.asarray(valid), 0.5)
        want = self._naive(img[:4], txt[:4], pids[:4], 0.5)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)


class TestLocalTokenAlignment:
    def _naive(self, img, txt, temp):
        """Reference math, unmasked (v0425_ablation.py:344-364)."""
        b, t, d = txt.shape
        att_sim = txt @ img.transpose(0, 2, 1) / np.sqrt(img.shape[2])
        att = np.exp(att_sim - att_sim.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        out = att @ img
        out = out / np.linalg.norm(out, axis=-1, keepdims=True)
        txt_n = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
        ws = txt_n @ out.transpose(0, 2, 1) / temp
        tgt = np.zeros((t, t))
        np.fill_diagonal(tgt, 1.0)
        l1 = naive_softmax_ce(ws.reshape(-1, t), np.tile(tgt, (b, 1)))
        l2 = naive_softmax_ce(ws.transpose(0, 2, 1).reshape(-1, t), np.tile(tgt, (b, 1)))
        return (l1 + l2) / 2

    def test_matches_reference_math_unmasked(self, rng):
        img = rng.normal(size=(3, 6, 8)).astype(np.float32)
        txt = rng.normal(size=(3, 4, 8)).astype(np.float32)
        got = local_token_alignment_loss(jnp.asarray(img), jnp.asarray(txt), None, 0.5)
        np.testing.assert_allclose(float(got), self._naive(img, txt, 0.5), rtol=1e-4)

    def test_masked_ignores_pads(self, rng):
        img = rng.normal(size=(2, 6, 8)).astype(np.float32)
        txt = rng.normal(size=(2, 5, 8)).astype(np.float32)
        mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32)
        got1 = local_token_alignment_loss(jnp.asarray(img), jnp.asarray(txt),
                                          jnp.asarray(mask), 0.5)
        # changing pad-position embeddings must not change the masked loss
        txt2 = txt.copy()
        txt2[0, 3:] = 42.0
        got2 = local_token_alignment_loss(jnp.asarray(img), jnp.asarray(txt2),
                                          jnp.asarray(mask), 0.5)
        np.testing.assert_allclose(float(got1), float(got2), rtol=1e-5)


class TestLMLoss:
    def test_matches_manual(self, rng):
        b, t, v = 2, 5, 7
        logp = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(b, t, v)), jnp.float32))
        ids = jnp.asarray(rng.integers(0, v, size=(b, t)), jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 0], [1, 1, 0, 0, 0]], jnp.int32)
        got = lm_loss(logp, ids, mask)
        acc, denom = 0.0, 0
        lp = np.asarray(logp)
        for bi in range(b):
            for i in range(t - 1):
                if mask[bi, i + 1]:
                    acc -= lp[bi, i, int(ids[bi, i + 1])]
                    denom += 1
        np.testing.assert_allclose(float(got), acc / denom, rtol=1e-5)


class TestGlobalBatchSemanticsUnderDP:
    """All-gathered (dp-sharded) contrastive loss == monolithic-batch loss (SURVEY §2.10)."""

    def test_sharded_equals_single_device(self, devices, rng):
        mesh = create_mesh(MeshSpec(dp=8))
        b = 16
        embed = rng.normal(size=(b, 8)).astype(np.float32)
        pids = np.repeat(np.arange(b // 2), 2).astype(np.int32)  # pairs split across shards
        valid = np.ones(b, bool)

        single = multi_positive_image_loss(jnp.asarray(embed), jnp.asarray(pids),
                                           jnp.asarray(valid), 0.5)
        batch = shard_batch({"e": embed, "p": pids, "v": valid}, mesh)
        fn = jax.jit(lambda d: multi_positive_image_loss(d["e"], d["p"], d["v"], 0.5))
        sharded = fn(batch)
        np.testing.assert_allclose(float(sharded), float(single), rtol=1e-5)


class TestMultiPositiveAvgFormulation:
    """PretrainNewMulPos's multi_pos_contra_images_v0404
    (v0425_ori.py:665-702): positives' logits AVERAGED into one logit, CE
    against the row's negatives (incl. one-view samples as negatives)."""

    def _naive(self, embed, pids, temp):
        from evoke_tpu.losses.contrastive import _l2_normalize  # noqa: F401
        labels = (pids[:, None] == pids[None, :]).astype(float)
        np.fill_diagonal(labels, 0.0)
        idx = np.where(labels.sum(1) != 0)[0]
        if len(idx) == 0:
            return 0.0
        e = embed / np.linalg.norm(embed, axis=-1, keepdims=True)
        logits = e @ e.T / temp
        np.fill_diagonal(logits, -1e9)
        logits = logits - logits.max(-1, keepdims=True)
        total = 0.0
        for i in idx:  # the reference's per-row loop, literally
            pos_mask = labels[i] != 0
            pos_logit = logits[i][pos_mask].sum() / pos_mask.sum()
            neg_logit = logits[i][~pos_mask]
            row = np.concatenate([[pos_logit], neg_logit])
            total += -(row[0] - np.log(np.exp(row).sum()))
        return total / len(idx)

    def test_matches_reference_math(self, rng):
        from evoke_tpu.losses.contrastive import multi_positive_image_loss_avg
        embed = rng.normal(size=(6, 8)).astype(np.float32)
        pids = np.array([0, 0, 1, 2, 2, 2])
        got = multi_positive_image_loss_avg(jnp.asarray(embed), jnp.asarray(pids),
                                            jnp.ones(6, bool), 0.5)
        np.testing.assert_allclose(float(got), self._naive(embed, pids, 0.5), rtol=1e-4)

    def test_no_pairs_returns_zero(self, rng):
        from evoke_tpu.losses.contrastive import multi_positive_image_loss_avg
        embed = rng.normal(size=(4, 8)).astype(np.float32)
        got = multi_positive_image_loss_avg(jnp.asarray(embed),
                                            jnp.asarray(np.arange(4)),
                                            jnp.ones(4, bool), 0.5)
        assert float(got) == 0.0

    def test_padding_rows_ignored(self, rng):
        from evoke_tpu.losses.contrastive import multi_positive_image_loss_avg
        embed = rng.normal(size=(6, 8)).astype(np.float32)
        pids = np.array([0, 0, 1, 1, 7, 7])
        valid = np.array([True] * 4 + [False] * 2)
        got = multi_positive_image_loss_avg(jnp.asarray(embed), jnp.asarray(pids),
                                            jnp.asarray(valid), 0.5)
        np.testing.assert_allclose(float(got), self._naive(embed[:4], pids[:4], 0.5),
                                   rtol=1e-4)
