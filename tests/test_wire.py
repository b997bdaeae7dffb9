"""Wire codec numerics (mec_tpu.serving.wire).

The perf-mode serving path ships packed 12-bit PCM audio (NOT 8-bit
mu-law — see wire.py for the measured rejection) and YUV 4:2:0 images
over the host->device link and expands them in the jitted graphs; these
tests pin the codec contracts. The engine-level decisions-don't-flip
check lives in tests/test_inference.py::TestWireServing (needs the
staged model artifacts) and tests/test_perf_mode.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mec_tpu.serving import wire


class TestPcm12:
    def test_round_trip_error_bound(self):
        rng = np.random.RandomState(0)
        x = np.clip(rng.randn(4, 4096).astype(np.float32) * 0.3, -1, 1)
        packed, scale = wire.encode_pcm12(x)
        back = np.asarray(wire.decode_pcm12(jnp.asarray(packed),
                                            jnp.asarray(scale)))
        # uniform quantizer: |err| <= half a step of scale/2047 per clip
        assert np.all(np.abs(back - x) <= 0.5001 * scale / 2047.0)

    def test_quiet_clips_scale_up(self):
        # per-clip scale: a quiet clip keeps 12 bits of ITS OWN range
        x = (np.linspace(-0.01, 0.01, 1000, dtype=np.float32))[None]
        packed, scale = wire.encode_pcm12(x)
        back = np.asarray(wire.decode_pcm12(jnp.asarray(packed),
                                            jnp.asarray(scale)))
        assert float(scale[0, 0]) == np.float32(0.01)
        assert np.abs(back - x).max() <= 0.01 / 2047.0 * 0.5001

    def test_wire_bytes(self):
        x = np.zeros((2, 66150), np.float32)
        packed, scale = wire.encode_pcm12(x)
        assert packed.shape == (2, 99225) and packed.dtype == np.uint8
        assert scale.shape == (2, 1) and scale.dtype == np.float32

    def test_zero_rows_decode_to_zero(self):
        # engine pads dispatch buckets with zero rows AFTER encoding;
        # zero bytes + zero scale must decode to exact 0.0
        packed = jnp.zeros((1, 99225), jnp.uint8)
        scale = jnp.zeros((1, 1), jnp.float32)
        out = np.asarray(wire.decode_pcm12(packed, scale))
        assert np.all(out == 0.0)

    def test_decoder_traceable(self):
        x = np.random.RandomState(1).randn(2, 64).astype(np.float32)
        packed, scale = wire.encode_pcm12(x)
        out = jax.jit(wire.decode_pcm12)(jnp.asarray(packed),
                                         jnp.asarray(scale))
        assert out.shape == (2, 64) and out.dtype == jnp.float32


class TestYuv420:
    def test_shapes_and_dtypes(self):
        imgs = np.random.RandomState(0).randint(
            0, 256, (3, 224, 224, 3), dtype=np.uint8)
        y8, uv8 = wire.encode_yuv420(imgs)
        assert y8.shape == (3, 224, 224) and y8.dtype == np.uint8
        assert uv8.shape == (3, 112, 112, 2) and uv8.dtype == np.uint8
        rgb = np.asarray(wire.decode_yuv420(jnp.asarray(y8),
                                            jnp.asarray(uv8)))
        assert rgb.shape == imgs.shape and rgb.dtype == np.float32
        assert rgb.min() >= 0.0 and rgb.max() <= 255.0

    def test_grayscale_exact_to_rounding(self):
        # R=G=B -> U=V=128: subsampling loses nothing, only +-1 rounding
        g = np.random.RandomState(1).randint(0, 256, (2, 8, 8),
                                             dtype=np.uint8)
        imgs = np.repeat(g[..., None], 3, axis=-1)
        y8, uv8 = wire.encode_yuv420(imgs)
        rgb = np.asarray(wire.decode_yuv420(jnp.asarray(y8),
                                            jnp.asarray(uv8)))
        assert np.abs(rgb - imgs.astype(np.float32)).max() <= 1.5

    def test_chroma_smooth_image_close(self):
        # photographic content: luma detail + smooth chroma (what JPEG
        # sources look like after their own 4:2:0 pass)
        rng = np.random.RandomState(2)
        luma = rng.randint(30, 220, (1, 224, 224, 1)).astype(np.float32)
        tint = rng.randint(-25, 25, (1, 7, 7, 3)).astype(np.float32)
        tint = np.kron(tint, np.ones((1, 32, 32, 1), np.float32))
        imgs = np.clip(luma + tint, 0, 255).astype(np.uint8)
        y8, uv8 = wire.encode_yuv420(imgs)
        rgb = np.asarray(wire.decode_yuv420(jnp.asarray(y8),
                                            jnp.asarray(uv8)))
        err = np.abs(rgb - imgs.astype(np.float32))
        # blocky tint edges cross 2x2 chroma cells: tiny tail is fine
        assert np.percentile(err, 99) <= 4.0
        assert err.mean() <= 1.0

    def test_decoder_traceable(self):
        imgs = np.random.RandomState(3).randint(
            0, 256, (2, 16, 16, 3), dtype=np.uint8)
        y8, uv8 = wire.encode_yuv420(imgs)
        out = jax.jit(wire.decode_yuv420)(jnp.asarray(y8), jnp.asarray(uv8))
        assert out.shape == (2, 16, 16, 3)

    def test_wire_bytes_halved(self):
        imgs = np.zeros((1, 224, 224, 3), np.uint8)
        y8, uv8 = wire.encode_yuv420(imgs)
        assert y8.nbytes + uv8.nbytes == imgs.nbytes // 2


class TestNativeEncoders:
    """The C++ encoders (native/wirecodec.cpp) must match the numpy
    reference implementations; they exist only because numpy spends
    ~158 ms per 32-batch on float32 temporaries."""

    @pytest.fixture(scope='class')
    def lib(self):
        lib = wire._native()
        if lib is None:
            pytest.skip('no C++ compiler available')
        return lib

    def test_pcm12_matches_numpy(self, lib):
        # non-saturating amplitudes on purpose: scale < 1 is the normal
        # serving case (PCM16-derived waves peak at k/32768) and is where
        # a reciprocal-multiply in the C++ loop diverges from numpy's
        # divide by 1 code — the encoder must divide
        for seed in range(5):
            x = np.clip(np.random.RandomState(seed)
                        .randn(5, 4096).astype(np.float32) * 0.23, -1, 1)
            x[3] *= 1e-4        # quiet clip
            x[4] = 0.0          # silent clip (scale floor)
            p_c, s_c = wire.encode_pcm12(x)
            p_np, s_np = wire.encode_pcm12_np(x)
            assert np.array_equal(s_c, s_np)
            assert np.array_equal(p_c, p_np), f'seed {seed}'

    def test_yuv420_matches_numpy(self, lib):
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 256, (3, 64, 64, 3), dtype=np.uint8)
        y_c, uv_c = wire.encode_yuv420(imgs)
        y_np, uv_np = wire.encode_yuv420_np(imgs)
        # identical float32 expressions, but summation order in
        # np.mean may differ from the C++ pairwise sum: allow 1 code
        assert np.abs(y_c.astype(int) - y_np.astype(int)).max() <= 1
        assert np.abs(uv_c.astype(int) - uv_np.astype(int)).max() <= 1
        assert (y_c != y_np).mean() < 0.01
        assert (uv_c != uv_np).mean() < 0.01
