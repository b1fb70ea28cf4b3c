import numpy as np
import pytest

from evoke_tpu.data.batching import MultiviewBatcher, Prefetcher
from evoke_tpu.data.datasets import load_annotation, parse_finetune, parse_pretrain
from evoke_tpu.data.synthetic import write_synthetic_dataset
from evoke_tpu.data.tokenizer import WordTokenizer
from evoke_tpu.data.transforms import ImageTransform, make_transform


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    ann_path = write_synthetic_dataset(root, n_train=12, n_val=4, n_test=4, image_size=48)
    ann = load_annotation(ann_path)
    corpus = [it["report"] for it in ann["train"]]
    tok = WordTokenizer.train(corpus)
    return root, ann, tok


class TestParsing:
    def test_pretrain_examples(self, dataset):
        root, ann, tok = dataset
        exs = parse_pretrain(ann, "train")
        assert len(exs) == 12
        ex = exs[0]
        assert ex.align_text.startswith("[CLS] ")
        assert isinstance(ex.aux_paths, list)

    def test_finetune_split_by_indication(self, dataset):
        root, ann, tok = dataset
        has_ind, no_ind = parse_finetune(ann, "train")
        assert len(has_ind) + len(no_ind) == 12
        assert all(ex.indication.startswith("[CLS] ") for ex in has_ind)
        assert all(ex.indication == "" for ex in no_ind)

    def test_multiview_cxr_schema_adapter(self):
        ann = {"train": [{
            "id": "x1",
            "anchor_scan": {"image_path": ["a.npy"], "view_position": "PA"},
            "auxiliary_references": {"image_path": ["b.npy", "c.npy"]},
            "findings_factual_serialization": ["cardiomegaly"],
            "report": "mild cardiomegaly .",
        }]}
        exs = parse_pretrain(ann, "train")
        assert exs[0].anchor_path == "a.npy"
        assert exs[0].aux_paths == ["b.npy", "c.npy"]
        assert "cardiomegaly" in exs[0].align_text


class TestBatcher:
    def test_static_shapes_and_layout(self, dataset):
        root, ann, tok = dataset
        exs = parse_pretrain(ann, "train")
        b = MultiviewBatcher(exs, tok, make_transform(48, train=True), n_anchor=4,
                             max_seq_len=16, image_dir=root, shuffle=True, seed=1)
        batches = list(b)
        assert len(batches) == 3
        for batch in batches:
            assert batch["images"].shape == (8, 48, 48, 3)  # 4 anchors + 4 aux slots
            assert batch["ids"].shape == (4, 16)
            assert batch["pids"].shape == (8,)
            # anchors are always valid, with codes 0..3
            np.testing.assert_array_equal(batch["pids"][:4], np.arange(4))
            assert batch["valid"][:4].all()
            # every valid aux slot points at an anchor's study
            for j in range(4, 8):
                if batch["valid"][j]:
                    assert 0 <= batch["pids"][j] < 4
                else:
                    assert batch["pids"][j] < 0

    def test_partial_final_batch_padded(self, dataset):
        root, ann, tok = dataset
        exs = parse_pretrain(ann, "train")[:5]
        b = MultiviewBatcher(exs, tok, make_transform(48, train=False), n_anchor=4,
                             max_seq_len=16, image_dir=root)
        batches = list(b)
        assert len(batches) == 2
        last = batches[-1]
        assert last["valid"][:4].sum() == 1  # one real anchor, three padding
        assert (last["ids"][1:] == tok.pad_id).all()

    def test_epochs_reshuffle(self, dataset):
        root, ann, tok = dataset
        exs = parse_pretrain(ann, "train")
        b = MultiviewBatcher(exs, tok, make_transform(48, train=False), n_anchor=4,
                             max_seq_len=16, image_dir=root, shuffle=True, seed=3)
        first = [bb["_image_ids"] for bb in b]
        second = [bb["_image_ids"] for bb in b]
        assert first != second

    def test_finetune_batches_with_indication(self, dataset):
        root, ann, tok = dataset
        has_ind, _ = parse_finetune(ann, "train")
        b = MultiviewBatcher(has_ind, tok, make_transform(48, train=True), n_anchor=2,
                             max_seq_len=16, image_dir=root, with_indication=True,
                             text_field="report", add_bos_eos=True)
        batch = next(iter(b))
        assert "inc_ids" in batch and batch["inc_ids"].shape == (2, 16)
        # report ids start with BOS
        real = batch["valid"][:2]
        assert (batch["ids"][real, 0] == tok.bos_id).all()
        assert (batch["inc_ids"][real, 0] == tok.cls_id).all()

    def test_prefetcher_preserves_order_and_errors(self, dataset):
        root, ann, tok = dataset
        exs = parse_pretrain(ann, "train")
        b = MultiviewBatcher(exs, tok, make_transform(48, train=False), n_anchor=4,
                             max_seq_len=16, image_dir=root)
        direct = [bb["_image_ids"] for bb in b]
        b._epoch = 0  # reset epoch so the same order replays
        pre = [bb["_image_ids"] for bb in Prefetcher(b, depth=2)]
        assert direct == pre

        def boom():
            yield 1
            raise RuntimeError("decode failed")

        it = iter(Prefetcher(boom(), depth=1))
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="decode failed"):
            next(it)


class TestTransforms:
    def test_train_eval_shapes(self, dataset):
        root, ann, tok = dataset
        from PIL import Image
        img = Image.new("RGB", (300, 200), (128, 64, 32))
        for size in (224, 384):
            for train in (True, False):
                tf = make_transform(size, train)
                out = tf(img, rng=np.random.default_rng(0))
                assert out.shape == (size, size, 3)
                assert out.dtype == np.float32

    def test_normalization(self):
        from PIL import Image
        img = Image.new("RGB", (224, 224), (124, 116, 104))  # ~ImageNet mean
        out = make_transform(224, train=False)(img)
        assert abs(float(out.mean())) < 0.05


class TestUint8Path:
    def test_uint8_transform_and_device_normalize(self, dataset):
        import jax.numpy as jnp
        from evoke_tpu.train.steps import maybe_normalize_images
        from PIL import Image
        img = Image.new("RGB", (300, 200), (124, 116, 104))
        tf8 = make_transform(224, train=False, output_uint8=True)
        tff = make_transform(224, train=False)
        u8 = tf8(img)
        assert u8.dtype == np.uint8
        batch = {"images": jnp.asarray(u8[None])}
        normed = maybe_normalize_images(batch)["images"]
        want = tff(img)[None]
        np.testing.assert_allclose(np.asarray(normed), want, atol=1e-5)

    def test_batcher_emits_uint8(self, dataset):
        root, ann, tok = dataset
        exs = parse_pretrain(ann, "train")
        b = MultiviewBatcher(exs, tok, make_transform(48, train=False, output_uint8=True),
                             n_anchor=4, max_seq_len=16, image_dir=root)
        batch = next(iter(b))
        assert batch["images"].dtype == np.uint8


class TestDevicePrefetch:
    def test_order_split_and_transfer(self, devices):
        import jax
        from evoke_tpu.data.batching import device_prefetch
        from evoke_tpu.core.mesh import MeshSpec, create_mesh

        mesh = create_mesh(MeshSpec(dp=8))
        batches = [{"images": np.full((8, 2), i, np.float32), "_image_ids": [f"b{i}"]}
                   for i in range(5)]
        out = list(device_prefetch(iter(batches), mesh, depth=2))
        assert len(out) == 5
        for i, (dev, host) in enumerate(out):
            assert host["_image_ids"] == [f"b{i}"]            # host extras preserved
            assert "_image_ids" not in dev                     # private keys stay host-side
            assert isinstance(dev["images"], jax.Array)
            np.testing.assert_allclose(np.asarray(dev["images"]), i)

    def test_no_mesh_plain_device_put(self):
        import jax
        from evoke_tpu.data.batching import device_prefetch
        batches = [{"x": np.ones(3, np.float32)}]
        (dev, host), = list(device_prefetch(iter(batches), None, depth=1))
        assert isinstance(dev["x"], jax.Array) and host == {}
