"""Spatial-transformer glimpse tests: pin the separable-matmul extraction to
classic bilinear grid-sample semantics (the reference uses F.grid_sample
[ref: supair.py]; oracle = map_coordinates gather).
"""

import jax
import jax.numpy as jnp
import numpy as np

from stove_tpu.ops import glimpse


def _rand_img(key, n=32):
    return jax.random.uniform(key, (n, n))


class TestExtract:
    def test_matches_gather_oracle(self):
        img = _rand_img(jax.random.key(0))
        boxes = jnp.array([
            [0.3, 0.4, -0.2, 0.1],
            [0.15, 0.15, 0.8, -0.7],   # partially out of frame
            [1.0, 1.0, 0.0, 0.0],      # whole image
        ])
        ours = glimpse.extract_glimpses(img[None], boxes[None], 10)[0]
        oracle = glimpse.reference_bilinear(img, boxes, 10)
        np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)

    def test_gather_variant_matches_oracle(self):
        img = _rand_img(jax.random.key(2))
        boxes = jnp.array([
            [0.3, 0.4, -0.2, 0.1],
            [0.15, 0.15, 0.8, -0.7],
            [1.0, 1.0, 0.0, 0.0],
        ])
        ours = glimpse.extract_glimpses_gather(img[None], boxes[None], 10)[0]
        oracle = glimpse.reference_bilinear(img, boxes, 10)
        np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)

    def test_identity_box_reproduces_image(self):
        img = _rand_img(jax.random.key(1))
        boxes = jnp.array([[1.0, 1.0, 0.0, 0.0]])
        patch = glimpse.extract_glimpses(img[None], boxes[None], 32)[0, 0]
        np.testing.assert_allclose(patch, img, atol=1e-5)

    def test_grad_flows_to_boxes(self):
        img = _rand_img(jax.random.key(2))

        def f(b):
            return jnp.sum(glimpse.extract_glimpses(img[None], b[None], 10))

        g = jax.grad(f)(jnp.array([[0.3, 0.3, 0.1, -0.1]]))
        assert jnp.all(jnp.isfinite(g)) and jnp.any(g != 0)

    def test_batch_shapes(self):
        imgs = jax.random.uniform(jax.random.key(3), (4, 32, 32))
        boxes = jax.random.uniform(jax.random.key(4), (4, 3, 4),
                                   minval=-0.5, maxval=0.5) + jnp.array(
            [0.4, 0.4, 0.0, 0.0])
        out = glimpse.extract_glimpses(imgs, boxes, 10)
        assert out.shape == (4, 3, 10, 10)


class TestCoverage:
    def test_inside_outside(self):
        boxes = jnp.array([[[0.5, 0.5, -0.5, -0.5]]])  # upper-left quadrant
        m = glimpse.box_coverage(boxes, 32)[0, 0]
        assert m.shape == (32, 32)
        assert float(m[8, 8]) > 0.9       # center of the box
        assert float(m[28, 28]) < 0.1     # far corner

    def test_background_visibility_complements(self):
        boxes = jnp.array([[[0.4, 0.4, 0.0, 0.0]]])
        cover = glimpse.box_coverage(boxes, 32)[0, 0]
        vis = glimpse.background_visibility(boxes, 32)[0]
        np.testing.assert_allclose(vis, 1.0 - cover, atol=1e-6)

    def test_differentiable(self):
        def f(b):
            return jnp.sum(glimpse.background_visibility(b, 32))

        g = jax.grad(f)(jnp.array([[[0.4, 0.4, 0.0, 0.0]]]))
        assert jnp.all(jnp.isfinite(g)) and jnp.any(g != 0)


class TestPaste:
    def test_roundtrip_center_box(self):
        img = _rand_img(jax.random.key(5))
        boxes = jnp.array([[[0.3, 0.3, 0.0, 0.0]]])
        patch = glimpse.extract_glimpses(img[None], boxes[0:1], 16)
        back = glimpse.paste_glimpses(patch, boxes[0:1], 32)[0, 0]
        # center pixel of the pasted box should approximate the original
        assert abs(float(back[16, 16]) - float(img[16, 16])) < 0.15
