"""Host-side mask generator distribution tests (masks.py:45-438 parity)."""

import numpy as np

from videoseal_tpu.augmentation import masks_host as mh


class TestGenerators:
    def test_irregular_shapes_and_coverage(self):
        rng = np.random.default_rng(0)
        m = mh.make_random_irregular_mask((128, 128), min_times=1, max_times=5,
                                          rng=rng)
        assert m.shape == (1, 128, 128)
        assert set(np.unique(m)) <= {0.0, 1.0}
        assert 0.0 < m.mean() < 1.0

    def test_rectangles_no_overlap(self):
        rng = np.random.default_rng(1)
        union, individual = mh.make_random_rectangle_mask(
            (128, 128), min_times=3, max_times=3, no_overlap=True, rng=rng)
        assert union.shape == (1, 128, 128)
        assert individual.shape[0] == 3
        # no two individual rectangles intersect
        assert (individual.sum(axis=0) <= 1.0 + 1e-6).all()
        np.testing.assert_allclose(union[0], individual.sum(axis=0)[0], atol=1e-6)

    def test_superres_grid_periodicity(self):
        rng = np.random.default_rng(2)
        m = mh.make_random_superres_mask((64, 64), min_step=4, max_step=4,
                                         min_width=1, max_width=1, rng=rng)[0]
        # every 4th row fully set; grid covers rows+cols
        row_means = m.mean(axis=1)
        assert (row_means[np.isclose(row_means, 1.0)].size >= 16)
        assert 0.25 <= m.mean() <= 0.75

    def test_outpainting_border(self):
        rng = np.random.default_rng(3)
        m = mh.make_outpainting_mask((100, 100), rng=rng)[0]
        assert m[0, 0] == 1.0 and m[-1, -1] == 1.0
        assert m[50, 50] == 0.0  # inner box cleared


class TestMixedEmbedder:
    def test_proportions_and_invert(self):
        emb = mh.MixedMaskEmbedder(seed=0)
        np.testing.assert_allclose(emb.probas, [0.25, 0.25, 0.25, 0.25])
        imgs = np.zeros((2, 64, 64, 3), np.float32)
        counts = {"full_or_inv": 0}
        means = []
        for _ in range(200):
            m = emb(imgs)
            assert m.shape == (2, 64, 64, 1)
            means.append(m.mean())
        means = np.asarray(means)
        # invert at 0.5 makes both all-ones and all-zeros appear
        assert (means > 0.999).sum() > 5
        assert (means < 0.001).sum() > 5
        # non-degenerate masks too
        assert ((means > 0.05) & (means < 0.95)).sum() > 50

    def test_optional_families(self):
        emb = mh.MixedMaskEmbedder(irregular_proba=0, box_proba=0, full_proba=0,
                                   segm_proba=0, superres_proba=1,
                                   invert_proba=0, seed=0)
        m = emb(np.zeros((1, 64, 64, 3), np.float32))
        # a superres grid strictly between 10% and 90% coverage
        assert 0.1 < m.mean() < 0.9

    def test_representative(self):
        emb = mh.MixedMaskEmbedder(seed=0)
        s = emb.sample_representative_masks(32, 32)
        assert s.shape == (5, 1, 32, 32)
        assert s[0].min() == 1.0  # full

    def test_registry(self):
        assert isinstance(mh.get_mask_embedder("none"), mh.NoMaskEmbedder)
        assert isinstance(mh.get_mask_embedder("mixed"), mh.MixedMaskEmbedder)
        assert isinstance(mh.get_mask_embedder(None), mh.MixedMaskEmbedder)
