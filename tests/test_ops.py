"""Unit tests for conv/pads, mask dilation, window views, composite argmax."""

import numpy as np
import jax.numpy as jnp

from async_ev_cnn_tpu.ops.conv import conv2d_dense, conv_out_shape, tf_same_pads
from async_ev_cnn_tpu.ops.masks import (
    chunk_to_mask,
    dilate_mask,
    mask_to_topk_coords,
    pool_out_shape,
    window_view,
)
from async_ev_cnn_tpu.ops.pool import composite_argmax, maxpool_dense


# ---- padding -------------------------------------------------------------


def test_tf_same_pads_3x3_s1():
    assert tf_same_pads(160, 224, 3, 3, 1) == ((1, 1), (1, 1))
    assert tf_same_pads(8, 8, 3, 3, 1) == ((1, 1), (1, 1))


def test_tf_same_pads_even_kernel():
    # k=2, s=1, H%1==0 -> pad = max(2-1,0)=1 -> top 0, bottom 1
    assert tf_same_pads(8, 8, 2, 2, 1) == ((0, 1), (0, 1))


def test_tf_same_pads_stride2_odd():
    # H=7, s=2: 7%2=1 -> pad = max(3-1,0)=2 -> (1,1)
    assert tf_same_pads(7, 7, 3, 3, 2) == ((1, 1), (1, 1))


def test_conv_out_shape():
    assert conv_out_shape(8, 8, 3, 3, 1, "SAME") == (8, 8)
    assert conv_out_shape(8, 8, 3, 3, 1, "VALID") == (6, 6)
    assert conv_out_shape(7, 9, 3, 3, 2, "SAME") == (4, 5)


# ---- dense conv ----------------------------------------------------------


def np_conv2d(x, k, b, stride, padding):
    """Direct-loop conv oracle; x [C,H,W], k [O,I,kh,kw]."""
    o, i, kh, kw = k.shape
    c, h, w = x.shape
    if padding == "SAME":
        (pt, pb), (pl, pr) = tf_same_pads(h, w, kh, kw, stride)
        x = np.pad(x, ((0, 0), (pt, pb), (pl, pr)))
        _, h, w = x.shape
    oh = (h - kh) // stride + 1
    ow = (w - kw) // stride + 1
    out = np.zeros((o, oh, ow), np.float32)
    for oc in range(o):
        for yy in range(oh):
            for xx in range(ow):
                patch = x[:, yy * stride : yy * stride + kh, xx * stride : xx * stride + kw]
                out[oc, yy, xx] = np.sum(patch * k[oc]) + (b[oc] if b is not None else 0)
    return out


def test_conv2d_dense_matches_loop(rng):
    x = rng.randn(3, 9, 11).astype(np.float32)
    k = rng.randn(4, 3, 3, 3).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    for padding in ("VALID", "SAME"):
        for stride in (1, 2):
            got = np.asarray(conv2d_dense(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), stride, padding))
            exp = np_conv2d(x, k, b, stride, padding)
            np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


# ---- mask dilation (the im2col_event covered-set rule) -------------------


def np_covered_set(mask, kh, kw, stride, pads):
    """Brute force: out site covered iff its receptive field contains an
    active input site — the dedup'd coordinate set im2col_event produces."""
    (pt, pb), (pl, pr) = pads
    m = np.pad(mask, ((pt, pb), (pl, pr)))
    h, w = m.shape
    oh = (h - kh) // stride + 1
    ow = (w - kw) // stride + 1
    out = np.zeros((oh, ow), bool)
    for yy in range(oh):
        for xx in range(ow):
            out[yy, xx] = m[yy * stride : yy * stride + kh, xx * stride : xx * stride + kw].any()
    return out


def test_dilate_mask_stride1(rng):
    mask = rng.rand(10, 12) < 0.1
    pads = ((1, 1), (1, 1))
    got = np.asarray(dilate_mask(jnp.asarray(mask), (3, 3), 1, pads))
    np.testing.assert_array_equal(got, np_covered_set(mask, 3, 3, 1, pads))


def test_dilate_mask_stride_k(rng):
    mask = rng.rand(10, 12) < 0.2
    got = np.asarray(dilate_mask(jnp.asarray(mask), (2, 2), 2))
    np.testing.assert_array_equal(got, np_covered_set(mask, 2, 2, 2, ((0, 0), (0, 0))))


def test_dilate_mask_general_stride(rng):
    # Capability superset: the Cython kernel only supports stride 1 or k
    # (cutils.pyx:78-89); the mask formulation handles any stride.
    mask = rng.rand(11, 13) < 0.2
    got = np.asarray(dilate_mask(jnp.asarray(mask), (3, 3), 2, ((1, 1), (1, 1))))
    np.testing.assert_array_equal(got, np_covered_set(mask, 3, 3, 2, ((1, 1), (1, 1))))


# ---- window view / pooling ----------------------------------------------


def test_window_view_row_major(rng):
    x = rng.randn(2, 6, 8).astype(np.float32)
    win = np.asarray(window_view(jnp.asarray(x), (2, 2), 2))
    assert win.shape == (2, 3, 4, 4)
    # row-major within window: [ (0,0), (0,1), (1,0), (1,1) ]
    np.testing.assert_array_equal(
        win[0, 1, 2], [x[0, 2, 4], x[0, 2, 5], x[0, 3, 4], x[0, 3, 5]]
    )


def test_window_view_crops_tail(rng):
    x = rng.randn(1, 7, 9).astype(np.float32)
    win = np.asarray(window_view(jnp.asarray(x), (2, 2), 2))
    assert win.shape == (1, 3, 4, 4)
    assert pool_out_shape(7, 9, (2, 2), 2) == (3, 4)


def test_maxpool_dense(rng):
    x = rng.randn(3, 6, 8).astype(np.float32)
    got = np.asarray(maxpool_dense(jnp.asarray(x), (2, 2), 2))
    exp = x.reshape(3, 3, 2, 4, 2).max(axis=(2, 4))
    np.testing.assert_array_equal(got, exp)


# ---- composite argmax (min_argmax semantics) -----------------------------


def np_min_argmax(max_col, min_col):
    """Scalar model of cutils.pyx:137-179 for one window."""
    argmax = 0
    argmin = 0
    for row in range(1, len(max_col)):
        if max_col[row] > max_col[argmax]:
            argmax = row
        elif max_col[row] == max_col[argmax] and min_col[row] < min_col[argmax]:
            argmax = row
        if min_col[row] < min_col[argmin]:
            argmin = row
    return argmax, min_col[argmax] != min_col[argmin]


def test_composite_argmax_random(rng):
    # Quantised values force plenty of exact ties.
    surf = rng.randint(0, 3, size=(5, 7, 4)).astype(np.float32)
    act = rng.randint(0, 3, size=(5, 7, 4)).astype(np.float32)
    idx, not_argmin = composite_argmax(jnp.asarray(surf), jnp.asarray(act))
    idx, not_argmin = np.asarray(idx), np.asarray(not_argmin)
    for i in range(5):
        for j in range(7):
            e_idx, e_flag = np_min_argmax(surf[i, j], act[i, j])
            assert idx[i, j] == e_idx, (i, j, surf[i, j], act[i, j])
            assert not_argmin[i, j] == e_flag


def test_composite_argmax_tie_break_cases():
    surf = jnp.asarray([[1.0, 1.0, 0.0]])
    act = jnp.asarray([[0.5, 0.2, 0.0]])
    idx, flag = composite_argmax(surf, act)
    assert int(idx[0]) == 1          # tie on max -> smaller actfn wins
    assert bool(flag[0])             # winner actfn 0.2 != column min 0.0

    surf = jnp.asarray([[2.0, 2.0, 2.0]])
    act = jnp.asarray([[0.3, 0.3, 0.9]])
    idx, flag = composite_argmax(surf, act)
    assert int(idx[0]) == 0          # (max, min) tie -> first index wins
    assert not bool(flag[0])         # winner actfn == column min


# ---- chunk -> mask / rulebook extraction ---------------------------------


def test_chunk_to_mask_drops_invalid():
    y = jnp.asarray([1, 2, 0], jnp.int32)
    x = jnp.asarray([1, 3, 0], jnp.int32)
    valid = jnp.asarray([True, True, False])
    m = np.asarray(chunk_to_mask(y, x, valid, 4, 5))
    assert m[1, 1] and m[2, 3] and not m[0, 0]
    assert m.sum() == 2


def test_mask_to_topk_coords(rng):
    mask = np.zeros((6, 7), bool)
    mask[1, 2] = mask[3, 0] = mask[5, 6] = True
    ys, xs, valid = mask_to_topk_coords(jnp.asarray(mask), 5)
    ys, xs, valid = np.asarray(ys), np.asarray(xs), np.asarray(valid)
    assert valid.sum() == 3
    got = set(zip(ys[valid].tolist(), xs[valid].tolist()))
    assert got == {(1, 2), (3, 0), (5, 6)}
    # row-major deterministic order
    np.testing.assert_array_equal(ys[:3], [1, 3, 5])


def test_chunk_to_mask_drops_negative_coords():
    """Negative coordinates must be dropped, not wrap numpy-style onto
    real pixels (the documented 'out-of-range entries are dropped'
    contract only held for indices >= size)."""
    import jax.numpy as jnp

    from async_ev_cnn_tpu.ops.masks import chunk_to_mask

    y = jnp.array([-1, 0, 2])
    x = jnp.array([0, -2, 1])
    valid = jnp.array([True, True, True])
    mask = np.asarray(chunk_to_mask(y, x, valid, 4, 4))
    assert mask.sum() == 1 and mask[2, 1]


def test_maxpool_dense_bool_input():
    """Pooling a boolean mask computes the window-wise OR instead of
    crashing on jnp.iinfo(bool)."""
    import jax.numpy as jnp

    from async_ev_cnn_tpu.ops.pool import maxpool_dense

    m = jnp.zeros((1, 4, 4), bool).at[0, 1, 1].set(True)
    out = np.asarray(maxpool_dense(m, (2, 2), 2))
    assert out.dtype == bool
    np.testing.assert_array_equal(out[0], [[True, False], [False, False]])
