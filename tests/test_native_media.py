"""Native C++ media runtime tests (libavcodec codec round trips, file IO)."""

import numpy as np
import pytest

from videoseal_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native media runtime not built")


def _frames(f=8, h=64, w=64):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([
        np.clip(np.stack([yy / h, xx / w, (xx + yy) / (h + w)], -1)
                + 0.1 * np.sin(xx / 9 + t)[..., None], 0, 1)
        for t in range(f)]).astype(np.float32)


class TestRoundtrip:
    @pytest.mark.parametrize("codec", ["h264", "h265", "vp9", "mpeg4", "mjpeg"])
    def test_codec(self, codec):
        if not native.codec_available(codec):
            pytest.skip(f"{codec} encoder missing")
        fr = _frames()
        out = native.video_roundtrip(fr, codec, crf=28)
        assert out.shape == fr.shape and out.dtype == np.float32
        mse = float(((out - fr) ** 2).mean())
        assert 0 < mse < 0.02  # lossy but close

    def test_crf_monotonic(self):
        fr = _frames()
        mses = [float(((native.video_roundtrip(fr, "h264", crf=c) - fr) ** 2).mean())
                for c in [18, 32, 46]]
        assert mses[0] < mses[1] < mses[2]

    def test_odd_dims_padded(self):
        fr = _frames(4, 63, 65)
        out = native.video_roundtrip(fr, "h264", crf=28)
        assert out.shape == fr.shape


class TestFileIO:
    def test_encode_decode_file(self, tmp_path):
        fr = _frames(12, 64, 64)
        path = str(tmp_path / "clip.mp4")
        native.encode_file(path, fr, codec="h264", crf=18, fps=24)
        r = native.VideoReader(path)
        assert (r.width, r.height) == (64, 64)
        got = r.read(12)
        assert got.shape == (12, 64, 64, 3)
        mse = ((got.astype(np.float32) / 255 - fr) ** 2).mean()
        assert mse < 0.01
        r.close()

    def test_read_planar_exact(self, tmp_path):
        """Planar decode (TPU serving layout) is bit-identical to rgb24."""
        from videoseal_tpu.kernels.fused_planar import C0, R0, planar_shape
        fr = _frames(6, 64, 96)
        path = str(tmp_path / "clip.mp4")
        native.encode_file(path, fr, codec="h264", crf=18, fps=24)
        r1 = native.VideoReader(path)
        a = r1.read(6)
        r1.close()
        r2 = native.VideoReader(path)
        b = r2.read_planar(6)
        r2.close()
        assert b.shape == planar_shape(6, 64, 96)
        bp = np.transpose(b[:, :, R0:R0 + 64, C0:C0 + 96], (0, 2, 3, 1))
        np.testing.assert_array_equal(a, bp)
        # padding stays zero
        assert b[:, :, :R0].max() == 0 and b[:, :, :, :C0].max() == 0

    def test_incremental_writer(self, tmp_path):
        """VideoWriter (open/write/close streaming encoder): exact frame
        count, fps metadata, chunked writes."""
        fr = _frames(10, 64, 96)
        u8 = (np.clip(fr, 0, 1) * 255).astype(np.uint8)
        path = str(tmp_path / "incr.mp4")
        w = native.VideoWriter(path, 96, 64, codec="h264", crf=18, fps=24)
        w.write(u8[:6])
        w.write(u8[6:])
        assert w.close() == 10
        r = native.VideoReader(path)
        back = r.read(15)
        assert back.shape[0] == 10 and abs(r.fps - 24.0) < 1e-6
        r.close()

    def test_incremental_writer_planar(self, tmp_path):
        """write_planar consumes the embed kernel's planar layout."""
        from videoseal_tpu.kernels.fused_planar import C0, R0, pack_planar
        fr = (np.clip(_frames(8, 64, 96), 0, 1) * 255).astype(np.uint8)
        fp = np.asarray(pack_planar(fr))
        path = str(tmp_path / "incrp.mp4")
        w = native.VideoWriter(path, 96, 64, codec="h264", crf=18, fps=24)
        w.write_planar(fp, r0=R0, c0=C0)
        assert w.close() == 8
        r = native.VideoReader(path)
        back = r.read(10)
        r.close()
        mse = ((back.astype(np.float32) / 255
                - fr.astype(np.float32) / 255) ** 2).mean()
        assert back.shape[0] == 8 and mse < 0.01

    def test_seek(self, tmp_path):
        fr = _frames(24, 64, 64)
        path = str(tmp_path / "clip.mp4")
        native.encode_file(path, fr, codec="h264", crf=18, fps=24)
        r = native.VideoReader(path)
        r.seek(12)
        got = r.read(4)
        assert got.shape[0] == 4
        r.close()


class TestExactAttackInJit:
    def test_straight_through_gradient(self):
        import jax
        import jax.numpy as jnp
        from videoseal_tpu.augmentation.augs import VideoCompressionExact

        aug = VideoCompressionExact(codec="h264")
        fr = jnp.asarray(_frames(4, 64, 64))
        mask = jnp.ones((4, 64, 64, 1))

        out, _ = aug.apply_strength(fr, mask, 28)
        assert float(jnp.abs(out - fr).max()) > 0  # codec really ran

        g = jax.grad(lambda x: jnp.sum(aug.apply_strength(x, mask, 28)[0]))(fr)
        # straight-through: gradient of sum == 1 inside [0,1] clip region
        assert 0.5 < float(jnp.abs(g).mean()) <= 1.0
