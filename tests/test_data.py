"""Host folder corpus, device sampler, and .mat eval-set loader."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestFolderCorpus:
    def test_load_corpus_and_sampler(self, tmp_path):
        from PIL import Image
        from tfpnp_tpu.data.folder import CorpusSampler, load_corpus

        rng = np.random.RandomState(0)
        for i, shape in enumerate([(40, 56), (64, 32), (48, 48)]):
            arr = (rng.rand(*shape) * 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(tmp_path / f"img{i}.png")
        corpus = load_corpus(tmp_path, size=32)
        assert corpus.shape == (3, 32, 32)
        assert corpus.dtype == np.float32
        assert 0.0 <= corpus.min() and corpus.max() <= 1.0

        sampler = CorpusSampler(corpus)
        gt = jax.jit(lambda k: sampler(k, 8))(jax.random.PRNGKey(0))
        assert gt.shape == (8, 32, 32)
        # every sampled image is a dihedral transform of some corpus image
        gt = np.asarray(gt)
        cands = []
        for c in corpus:
            for f in (lambda a: a, lambda a: a[:, ::-1], lambda a: a[::-1],
                      lambda a: a[::-1, ::-1]):
                cands.append(f(c)); cands.append(f(c).T)
        for img in gt:
            assert any(np.allclose(img, c, atol=1e-6) for c in cands)

    def test_empty_folder_raises(self, tmp_path):
        from tfpnp_tpu.data.folder import load_corpus
        with pytest.raises(FileNotFoundError):
            load_corpus(tmp_path, size=32)

    def test_gt_source_procedural_default(self):
        from types import SimpleNamespace
        from tfpnp_tpu.data import gt_source
        opt = SimpleNamespace(image_size=32, data_root=None)
        gt = gt_source(opt)(jax.random.PRNGKey(0), 4)
        assert gt.shape == (4, 32, 32)


class TestMatLoader:
    def test_load_csmri_mat_roundtrip(self, tmp_path):
        """Write a .mat in the reference CSMRIEvalDataset field layout
        (tasks/csmri/dataset.py:85-107) and read it back."""
        from scipy.io import savemat
        from tfpnp_tpu.data.folder import load_csmri_mat

        rng = np.random.RandomState(0)
        gt = rng.rand(16, 16).astype(np.float32)
        mask = rng.rand(16, 16) > 0.5
        y0 = (np.fft.fftshift(np.fft.fft2(gt, norm="ortho")) * mask)
        p = tmp_path / "case0.mat"
        savemat(p, {"gt": gt, "y0": np.stack([y0.real, y0.imag], -1),
                    "mask": mask.astype(np.uint8), "sigma_n": 0.05})
        data = load_csmri_mat([p])
        assert data["gt"].shape == (1, 16, 16)
        assert data["y0"].dtype == jnp.complex64
        assert data["mask"].dtype == bool
        np.testing.assert_allclose(np.asarray(data["gt"][0]), gt, atol=1e-6)
        np.testing.assert_allclose(np.asarray(data["y0"][0]), y0, atol=1e-5)


class TestNpzDataSets:
    def test_roundtrip_complex_bool_float(self, tmp_path):
        """save_data_npz/load_data_npz must round-trip a full eval batch;
        complex leaves travel as __re/__im float pairs and are recombined
        inside jit (tunneled-TPU eager-complex ban, CLAUDE.md rules 3-4)."""
        from tfpnp_tpu.data.npz import load_data_npz, save_data_npz

        rng = np.random.RandomState(0)
        data = {
            "gt": jnp.asarray(rng.rand(3, 8, 8).astype(np.float32)),
            "y0": jnp.asarray(rng.rand(3, 8, 8) + 1j * rng.rand(3, 8, 8),
                              jnp.complex64),
            "mask": jnp.asarray(rng.rand(3, 8, 8) > 0.5),
            "sigma_n": jnp.asarray([0.02, 0.04, 0.06], jnp.float32),
        }
        p = tmp_path / "set.npz"
        save_data_npz(p, data)
        back = load_data_npz(p)
        assert set(back) == set(data)
        assert back["y0"].dtype == jnp.complex64
        assert back["mask"].dtype == bool
        for k in data:
            np.testing.assert_allclose(np.asarray(back[k]),
                                       np.asarray(data[k]), atol=1e-6)

    def test_reference_sigma_array_layout(self, tmp_path):
        """The reference stores sigma_n broadcast to y0's shape
        (tasks/csmri/dataset.py:67); the loader must take a scalar."""
        from scipy.io import savemat
        from tfpnp_tpu.data.folder import load_csmri_mat

        rng = np.random.RandomState(1)
        gt = rng.rand(1, 16, 16).astype(np.float32)
        y0 = np.stack([rng.randn(16, 16), rng.randn(16, 16)], -1)[None]
        savemat(tmp_path / "c.mat",
                {"gt": gt, "y0": y0, "mask": np.ones((16, 16), np.uint8),
                 "sigma_n": np.ones((1, 16, 16, 2), np.float32) * 0.04})
        data = load_csmri_mat([tmp_path / "c.mat"])
        np.testing.assert_allclose(np.asarray(data["sigma_n"]), [0.04],
                                   atol=1e-7)
