"""Color ops tests (brightness_matcher.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from mladversarialobjectdetection_tpu.ops import color


def test_yuv_roundtrip():
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
    back = color.yuv_to_rgb(color.rgb_to_yuv(img))
    assert np.allclose(back, img, atol=1e-4)


def test_brightness_match_aligns_means():
    key = jax.random.PRNGKey(1)
    src = jax.random.uniform(key, (32, 32, 3), minval=-1.0, maxval=-0.2)
    tgt = jax.random.uniform(key, (32, 32, 3), minval=0.2, maxval=0.9)
    out = color.brightness_match(src, tgt)
    out_y = color.rgb_to_yuv((out + 1) * 127 / 255)[..., 0]
    tgt_y = color.rgb_to_yuv((tgt + 1) * 127 / 255)[..., 0]
    assert abs(float(out_y.mean()) - float(tgt_y.mean())) < 0.05
    assert float(out.min()) >= -1.001 and float(out.max()) <= 1.001


def test_brightness_match_differentiable():
    src = jnp.full((8, 8, 3), 0.1)
    tgt = jnp.full((8, 8, 3), 0.5)
    g = jax.grad(lambda s: jnp.sum(color.brightness_match(s, tgt)))(src)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_histogram_match_matches_distribution():
    key = jax.random.PRNGKey(2)
    src = jax.random.uniform(key, (64, 64, 3), minval=-1.0, maxval=0.0)
    tgt = jax.random.uniform(jax.random.PRNGKey(3), (64, 64, 3),
                             minval=0.0, maxval=1.0)
    out = color.histogram_match(src, tgt)
    out_y = color.rgb_to_yuv((out + 1) * 127 / 255)[..., 0]
    tgt_y = color.rgb_to_yuv((tgt + 1) * 127 / 255)[..., 0]
    # distribution quantiles should roughly align after specification
    for q in (0.25, 0.5, 0.75):
        assert abs(float(jnp.quantile(out_y, q)) -
                   float(jnp.quantile(tgt_y, q))) < 0.1


def test_random_print_adjust_bounds():
    patch = jax.random.uniform(jax.random.PRNGKey(4), (16, 16, 3),
                               minval=-1, maxval=1)
    out = color.random_print_adjust(jax.random.PRNGKey(5), patch)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    # gain centered at .5 shrinks dynamic range on average
    assert float(jnp.std(out)) < float(jnp.std(patch))
