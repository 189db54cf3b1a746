"""Code store round-trip tests: native C++ backend vs numpy fallback must be
interchangeable on the same file (one on-disk format)."""

import numpy as np
import pytest

from vqvae2_tpu.data import codestore as cs


def _write(path, use_native, n=37, top=(4, 4), bot=(8, 8), seed=0):
    rng = np.random.default_rng(seed)
    tops = rng.integers(0, 512, size=(n, *top)).astype(np.int16)
    bots = rng.integers(0, 512, size=(n, *bot)).astype(np.int16)
    labels = rng.integers(0, 100, size=(n,)).astype(np.int32)
    names = [f"img_{i:04d}.png" for i in range(n)]
    with cs.CodeStoreWriter(str(path), top, bot, use_native=use_native) as w:
        # two appends to exercise streaming
        w.append(tops[:20], bots[:20], labels[:20], names[:20])
        w.append(tops[20:], bots[20:], labels[20:], names[20:])
    return tops, bots, labels, names


@pytest.mark.parametrize("write_native,read_native", [
    (False, False), (True, True), (True, False), (False, True),
])
def test_roundtrip_cross_backend(tmp_path, write_native, read_native):
    if (write_native or read_native) and cs._load_native() is None:
        pytest.skip("native codestore unavailable")
    path = tmp_path / "codes.vq2"
    tops, bots, labels, names = _write(path, write_native)

    store = cs.CodeStore(str(path), use_native=read_native)
    assert len(store) == 37
    assert store.top_shape == (4, 4) and store.bot_shape == (8, 8)

    t, b, l, nm = store[5]
    np.testing.assert_array_equal(t, tops[5])
    np.testing.assert_array_equal(b, bots[5])
    assert l == labels[5] and nm == names[5]

    idx = np.asarray([0, 36, 3, 3, 11])
    gt, gb, gl = store.gather(idx)
    np.testing.assert_array_equal(gt, tops[idx])
    np.testing.assert_array_equal(gb, bots[idx])
    np.testing.assert_array_equal(gl, labels[idx])
    store.close()


def test_native_builds():
    lib = cs._load_native()
    assert lib is not None, "native codestore failed to build (g++ required)"


def test_large_gather_parallel(tmp_path):
    if cs._load_native() is None:
        pytest.skip("native codestore unavailable")
    path = tmp_path / "big.vq2"
    n = 500
    tops, bots, labels, names = _write(path, True, n=n)
    store = cs.CodeStore(str(path), use_native=True)
    idx = np.random.default_rng(1).integers(0, n, size=256)
    gt, gb, gl = store.gather(idx, n_threads=8)
    np.testing.assert_array_equal(gt, tops[idx])
    np.testing.assert_array_equal(gl, labels[idx])
    store.close()
