"""LPIPS loader/metric tests: npz converter layout round-trip (with
synthetic weights — no pretrained checkpoints ship in this env), the
has_pretrained gate, and basic metric sanity."""
import numpy as np
import jax.numpy as jnp

from hugs_tpu.losses import LPIPS

_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def synth_npz(path, seed=0):
    """Write an npz in the exact layout scripts/convert_lpips.py emits."""
    rng = np.random.RandomState(seed)
    out = {}
    cin = 3
    i = 0
    for cout, n in _VGG_BLOCKS:
        for _ in range(n):
            out[f"conv_{i}_w"] = (rng.randn(3, 3, cin, cout)
                                  * np.sqrt(2.0 / (9 * cin))).astype(
                                      np.float32)
            out[f"conv_{i}_b"] = np.zeros(cout, np.float32)
            cin = cout
            i += 1
    for t, (cout, _) in enumerate(_VGG_BLOCKS):
        out[f"lin_{t}"] = np.abs(rng.randn(cout)).astype(np.float32)
    np.savez(path, **out)
    return out


def test_npz_roundtrip(tmp_path):
    path = str(tmp_path / "lpips_synth.npz")
    raw = synth_npz(path)
    lp = LPIPS.create(path)
    assert lp.has_pretrained
    assert len(lp.conv_weights) == 13 and len(lp.lin_weights) == 5
    np.testing.assert_array_equal(np.asarray(lp.conv_weights[3]),
                                  raw["conv_3_w"])
    np.testing.assert_array_equal(np.asarray(lp.lin_weights[4]),
                                  raw["lin_4"])
    # identical images -> 0; different -> > 0; symmetric
    a = jnp.linspace(0, 1, 3 * 32 * 32).reshape(1, 3, 32, 32)
    b = a[:, :, ::-1, :]
    d_aa = float(lp(a, a)[0])
    d_ab = float(lp(a, b)[0])
    d_ba = float(lp(b, a)[0])
    assert abs(d_aa) < 1e-6
    assert d_ab > 1e-4
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_fallback_not_pretrained():
    lp = LPIPS.create(None)
    assert not lp.has_pretrained


def test_crop_call_exact():
    """crop_call on a static canvas == __call__ on the dynamic crop —
    exactly (to fp), including odd extents that exercise the VALID
    stride-2 pooling floor and conv-bias edge leakage."""
    lp = LPIPS.create(None)
    rng = np.random.RandomState(9)
    for h, w in ((75, 53), (64, 64), (37, 101)):
        a = np.zeros((1, 3, 128, 128), np.float32)
        b = np.zeros((1, 3, 128, 128), np.float32)
        a[:, :, :h, :w] = rng.rand(1, 3, h, w)
        b[:, :, :h, :w] = rng.rand(1, 3, h, w)
        ref = float(lp(jnp.asarray(a[:, :, :h, :w]),
                       jnp.asarray(b[:, :, :h, :w]))[0])
        got = float(lp.crop_call(jnp.asarray(a), jnp.asarray(b),
                                 jnp.int32(h), jnp.int32(w))[0])
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-7)
