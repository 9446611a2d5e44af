"""NumStruct indexing semantics (reference: casadi numeric structs are
(n, 1) column DMs, so both name-based and positional — including 2-axis —
indexing must work, e.g. ``mhe.p_est0[0, 0]``)."""
import numpy as np

from dompc_tpu.tools import NumStruct, StructSpec


def _spec():
    return StructSpec([("a", (2, 1)), ("B", (2, 2)), ("c", 1)])


def test_name_indexing_roundtrip():
    s = NumStruct(_spec())
    s["a"] = np.array([[1.0], [2.0]])
    s["B"] = np.array([[3.0, 4.0], [5.0, 6.0]])
    s["c"] = 7.0
    np.testing.assert_array_equal(s["a"], [[1.0], [2.0]])
    np.testing.assert_array_equal(s["B"], [[3.0, 4.0], [5.0, 6.0]])
    # column-major (casadi) flattening of the matrix block
    np.testing.assert_array_equal(s.data, [1, 2, 3, 5, 4, 6, 7])


def test_positional_single_axis():
    s = NumStruct(_spec(), value=0.0)
    s[0] = 9.0
    assert s[0] == 9.0
    assert float(s.data[0]) == 9.0


def test_positional_two_axis():
    # (n, 1)-column semantics: struct[i, 0] addresses flat element i
    s = NumStruct(_spec(), value=0.0)
    s[3, 0] = 5.5
    assert s[3, 0] == 5.5
    assert float(s.data[3]) == 5.5
    got = s[np.arange(3), 0]
    np.testing.assert_array_equal(got, [0.0, 0.0, 0.0])


def test_tuple_name_indexing():
    s = NumStruct(_spec())
    s["B", 1, 0] = 2.5
    assert s["B", 1, 0] == 2.5
    np.testing.assert_array_equal(s["B"][1, 0], 2.5)
