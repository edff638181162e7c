import numpy as np
import pytest

native = pytest.importorskip("transit_tpu._native")

from transit_tpu.opacities import lbl


def python_partition(wavn, isoid, owns_v, wn_i, odwn, dwn, wn_top):
    """The pure-Python reference loop (lbl.plan_lines fallback body)."""
    n = wavn.shape[0]
    onwn = owns_v.shape[0]
    gid = np.zeros(n, dtype=np.int32)
    prim, inr, iown_l, idwn_l = [], [], [], []
    i = 0
    while i < n:
        g = len(prim)
        w = wavn[i]
        gid[i] = g
        prim.append(i)
        if w < wn_i or w > wn_top:
            inr.append(False); iown_l.append(0); idwn_l.append(0)
            i += 1
            continue
        iown = int((w - wn_i) / odwn)
        if iown + 1 < onwn and abs(w - owns_v[iown + 1]) < abs(
                w - owns_v[iown]):
            iown += 1
        center = owns_v[iown]
        j = i + 1
        while j < n and isoid[j] == isoid[i] and abs(
                wavn[j] - center) < odwn:
            gid[j] = g
            j += 1
        inr.append(True); iown_l.append(iown)
        idwn_l.append(int((w - wn_i) / dwn))
        i = j
    return (gid, np.array(prim), np.array(inr, bool),
            np.array(iown_l), np.array(idwn_l))


def test_group_partition_matches_python():
    rng = np.random.default_rng(0)
    wn_i, dwn, osamp = 1000.0, 0.5, 12
    odwn = dwn / osamp
    owns_v = wn_i + odwn * np.arange(2401)
    wn_top = owns_v[-1]
    # Clustered + scattered lines across two isotopes, some out of range:
    w1 = np.sort(np.concatenate([
        rng.uniform(995.0, 2010.0, 800),
        1500.0 + rng.uniform(-0.01, 0.01, 200),
        1750.25 + rng.uniform(-0.02, 0.02, 100)]))
    w2 = np.sort(rng.uniform(1000.0, 2000.0, 300))
    wavn = np.concatenate([w1, w2])
    isoid = np.concatenate([np.zeros(1100, np.int32),
                            np.ones(300, np.int32)])

    gid_b, prim_b, inr_b, iown_b, idwn_b = native.group_partition(
        wavn, isoid, owns_v, wn_i, odwn, dwn, wn_top)
    gid = np.frombuffer(gid_b, np.int32)
    prim = np.frombuffer(prim_b, np.int32)
    inr = np.frombuffer(inr_b, np.uint8).astype(bool)
    iown = np.frombuffer(iown_b, np.int64)
    idwn = np.frombuffer(idwn_b, np.int64)

    pgid, pprim, pinr, piown, pidwn = python_partition(
        wavn, isoid, owns_v, wn_i, odwn, dwn, wn_top)
    np.testing.assert_array_equal(gid, pgid)
    np.testing.assert_array_equal(prim, pprim)
    np.testing.assert_array_equal(inr, pinr)
    np.testing.assert_array_equal(iown, piown)
    np.testing.assert_array_equal(idwn, pidwn)


def test_parse_fixed_floats():
    recs = b" 12.5  3.0\n-7.25  0.1\n 1e-3 -2E4\n"
    out = np.frombuffer(native.parse_fixed_floats(recs, 11, 0, 5, 3))
    np.testing.assert_allclose(out, [12.5, -7.25, 1e-3])
    out2 = np.frombuffer(native.parse_fixed_floats(recs, 11, 5, 5, 3))
    np.testing.assert_allclose(out2, [3.0, 0.1, -2e4])


def test_parse_fixed_floats_bounds():
    with pytest.raises(ValueError):
        native.parse_fixed_floats(b"123", 11, 0, 5, 3)


def test_argsort_iso_wl_matches_lexsort():
    """Native radix argsort == np.lexsort((wl, isoid)) incl. stability
    on duplicate wavelengths, signed zeros, and negatives."""
    rng = np.random.default_rng(3)
    n = 50_000
    wl = rng.uniform(0.3, 30.0, n)
    wl[::13] = 5.0                      # duplicates exercise stability
    wl[::101] = 0.0
    wl[1::101] = -0.0
    wl[2::101] = -wl[2::101]
    iso = rng.integers(0, 7, n).astype(np.int32)
    got = np.frombuffer(native.argsort_iso_wl(iso, wl), dtype=np.int64)
    np.testing.assert_array_equal(got, np.lexsort((wl, iso)))


def test_argsort_iso_wl_empty_and_single():
    for wl, iso in [(np.array([]), np.array([], dtype=np.int32)),
                    (np.array([4.2]), np.array([3], dtype=np.int32))]:
        got = np.frombuffer(native.argsort_iso_wl(iso, wl), dtype=np.int64)
        np.testing.assert_array_equal(got, np.lexsort((wl, iso)))


def test_sort_iso_wl_wrapper():
    from transit_tpu.lineread.compile import sort_iso_wl
    rng = np.random.default_rng(4)
    wl = rng.uniform(1.0, 20.0, 1000)
    iso = rng.integers(0, 3, 1000).astype(np.int16)   # int16, as TLI stores
    np.testing.assert_array_equal(sort_iso_wl(iso, wl),
                                  np.lexsort((wl, iso)))
