"""Unit coverage of core.data.IntVec — the growable numpy vector behind
the global gene/protein tables (list-style semantics + zero-copy asarray).
The pipeline exercises it end-to-end; these pin the contract directly."""
import numpy as np

from pangene_tpu.core.data import IntVec


def test_append_growth_and_values():
    v = IntVec(np.int64)
    for i in range(100):
        v.append(i * 3)
    assert len(v) == 100
    assert v[0] == 0 and v[99] == 297
    np.testing.assert_array_equal(np.asarray(v), np.arange(100) * 3)


def test_extend_and_extend_zeros():
    v = IntVec(np.int32)
    v.extend([1, 2, 3])
    v.extend_zeros(4)
    v.extend_zeros(2, fill=-1)
    v.extend(np.array([9, 9], np.int64))   # dtype-converted on entry
    assert np.asarray(v).tolist() == [1, 2, 3, 0, 0, 0, 0, -1, -1, 9, 9]
    v.extend_zeros(0)
    assert len(v) == 11


def test_setitem_getitem_slice_iter():
    v = IntVec(np.int64)
    v.extend(range(10))
    v[3] = 42
    assert v[3] == 42
    assert list(v)[:4] == [0, 1, 2, 42]
    np.testing.assert_array_equal(v[2:5], np.array([2, 42, 4]))
    v[1:3] = [7, 8]
    assert v.tolist()[:4] == [0, 7, 8, 42]


def test_asarray_zero_copy_view_and_dtype_convert():
    v = IntVec(np.int64)
    v.extend([5, 6, 7])
    a = np.asarray(v)
    assert a.base is not None or a is v.view()   # shares the buffer
    v[0] = 99
    assert a[0] == 99                            # view sees writes
    b = np.asarray(v, np.int32)
    assert b.dtype == np.int32 and b[0] == 99
    b[0] = 1                                     # converted copy: no alias
    assert v[0] == 99


def test_view_scatter_matches_list_semantics():
    """The ingest path scatters into view(); must hit the live prefix."""
    v = IntVec(np.int64)
    v.extend_zeros(8)
    w = v.view()
    w[np.array([1, 5])] = np.array([10, 50])
    assert v[1] == 10 and v[5] == 50
    v.append(77)                                 # growth after a view
    assert v[8] == 77 and v[5] == 50


def test_from_array_copy():
    src = np.array([1, 2, 3], np.int64)
    v = IntVec.from_array(src)
    src[0] = 9
    assert v[0] == 1                             # from_array copies
    v.append(4)
    assert v.tolist() == [1, 2, 3, 4]
