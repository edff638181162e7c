import os
import subprocess

import numpy as np
import pytest

from transit_tpu.io.tli import read_tli
from transit_tpu.lineread.base import load_isotopologues
from transit_tpu.lineread.compile import compile_tli
from transit_tpu.lineread.hitran import HitranReader, C1
from transit_tpu.lineread.kurucz import PandsReader
from transit_tpu.lineread.misc import RepackReader

_C = 299792458.0


def make_par_line(mol, iso, wn, S, A, elow, glow):
    """One HITRAN2012 .par record (160 chars)."""
    line = (f"{mol:2d}{iso:1d}{wn:12.6f}{S:10.3E}{A:10.3E}"
            f"{0.0500:5.3f}{0.070:5.3f}{elow:10.4f}{0.75:4.2f}"
            f"{0.0:8.6f}")
    line += " " * 60         # quanta
    line += "000000"         # ierr
    line += " " * 12         # iref
    line += " "              # flag
    line += f"{10.0:7.1f}"   # g upper
    line += f"{glow:7.1f}"   # g lower
    assert len(line) == 160, len(line)
    return line + "\n"


@pytest.fixture
def par_file(tmp_path):
    p = tmp_path / "06_test.par"
    rows = [
        (6, 1, 3030.0, 1e-20, 2.5, 100.0, 11.0),
        (6, 1, 3050.5, 2e-21, 1.0, 300.0, 9.0),
        (6, 2, 3040.25, 3e-22, 0.5, 50.0, 7.0),
        (6, 3, 3060.0, 4e-23, 0.25, 10.0, 5.0),
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(make_par_line(*r))
    return str(p), rows


def test_isotopologue_table():
    rows = load_isotopologues()
    ch4 = [r for r in rows if r["molecule"] == "CH4"]
    assert len(ch4) >= 3
    assert ch4[0]["mol_id"] == 6
    assert abs(ch4[0]["mass"] - 16.04) < 0.01
    assert abs(ch4[0]["ratio"] - 0.9883) < 1e-3


def test_hitran_reader(par_file):
    path, rows = par_file
    r = HitranReader(path)
    assert r.molecule == "CH4"
    wl, gf, elow, isoid = r.read(3.0, 3.4)
    assert wl.shape[0] == 4
    np.testing.assert_allclose(np.sort(1e4 / wl),
                               [3030.0, 3040.25, 3050.5, 3060.0])
    assert set(isoid.tolist()) == {0, 1, 2}
    # gf from Einstein A (db_hitran.py:388):
    k = np.argsort(1e4 / wl)
    wn0, A0, g0 = 3030.0, 2.5, 11.0
    expect = A0 * g0 * C1 / (8.0 * np.pi * _C * 100.0) / wn0 ** 2
    np.testing.assert_allclose(gf[k][0], expect, rtol=1e-10)
    np.testing.assert_allclose(elow[k][0], 100.0)


def test_hitran_window_clip(par_file):
    path, _ = par_file
    r = HitranReader(path)
    wl, gf, elow, isoid = r.read(1e4 / 3055.0, 1e4 / 3035.0)
    np.testing.assert_allclose(np.sort(1e4 / wl), [3040.25, 3050.5])


def test_compile_and_roundtrip(par_file, tmp_path):
    path, _ = par_file
    r = HitranReader(path)
    out = str(tmp_path / "test.tli")
    block = r.block(3.0, 3.4)
    data = compile_tli([block], 3.0, 3.4, out)
    back = read_tli(out)
    assert back.n_lines == 4
    # Sorted by isotope then wavelength:
    assert np.all(np.diff(back.isoid) >= 0)
    for i in np.unique(back.isoid):
        w = back.wl[back.isoid == i]
        assert np.all(np.diff(w) > 0)
    assert back.databases[0].molecule == "CH4"
    assert len(back.databases[0].isotopes) == len(r.iso_names)
    np.testing.assert_array_equal(back.isotran, [2, 1, 1])


def test_pands_reader(tmp_path):
    # Synthesize a P&S binary file and decode it back:
    ratiolog = np.log(1 + 1 / 2e6)
    wl_nm = np.array([2500.0, 2600.0, 2700.0, 2800.0])
    iw = np.round(np.log(wl_nm) / ratiolog).astype(np.uint32)
    ielo = np.array([500, -700, 800, -900], np.int16)   # sign -> iso bit
    igf = np.array([16000, 15000, -14000, -13000], np.int16)
    rec = np.zeros(4, dtype=np.dtype([("iw", "<u4"), ("ielo", "<i2"),
                                      ("igf", "<i2")]))
    rec["iw"], rec["ielo"], rec["igf"] = iw, ielo, igf
    p = tmp_path / "ps.bin"
    rec.tofile(p)
    r = PandsReader(str(p))
    wl, gf, elow, isoid = r.read(2.0, 3.0)
    np.testing.assert_allclose(wl * 1e3, wl_nm, rtol=1e-6)
    np.testing.assert_array_equal(isoid, [0, 2, 1, 3])
    np.testing.assert_allclose(elow, [500, 700, 800, 900])
    np.testing.assert_allclose(
        gf, 4 * 10.0 ** (0.001 * (np.abs(igf) - 16384)))


def test_repack_reader(tmp_path):
    rec = np.zeros(5, dtype=np.dtype([("wn", "<f8"), ("elow", "<f8"),
                                      ("gf", "<f8"), ("iso", "<i4")]))
    rec["wn"] = [2000.0, 2100.0, 2200.0, 2300.0, 2400.0]
    rec["elow"] = [1, 2, 3, 4, 5]
    rec["gf"] = [1e-4, 1e-5, 1e-6, 1e-7, 1e-8]
    rec["iso"] = [21111, 21111, 31111, 21111, 31111]
    p = tmp_path / "CH4_repack_lbl.dat"
    rec.tofile(p)
    pf = tmp_path / "CH4_pf.dat"
    pf.write_text("# pf\n@ISOTOPES 21111 31111\n"
                  "100.0 10.0 11.0\n1000.0 100.0 110.0\n")
    r = RepackReader(str(p), str(pf))
    assert r.molecule == "CH4"
    wl, gf, elow, isoid = r.read(1e4 / 2350.0, 1e4 / 2050.0)
    np.testing.assert_allclose(1e4 / wl, [2100.0, 2200.0, 2300.0])
    np.testing.assert_array_equal(isoid, [0, 1, 0])
    temps, pfv = r.partition()
    np.testing.assert_allclose(temps, [100.0, 1000.0])
    np.testing.assert_allclose(pfv, [[10.0, 100.0], [11.0, 110.0]])


def test_compiled_tli_feeds_reference_binary(par_file, tmp_path):
    """A TLI compiled by this package must be readable by the reference C
    transit (readlineinfo.c)."""
    binpath = os.environ.get("TRANSIT_REF_BIN",
                             "/tmp/refbuild/transit/transit")
    if not os.path.exists(binpath):
        pytest.skip("reference binary not available")
    path, _ = par_file
    r = HitranReader(path)
    out = str(tmp_path / "t.tli")
    compile_tli([r.block(3.0, 3.4)], 3.0, 3.4, out)

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures")
    cfg = tmp_path / "run.cfg"
    cfg.write_text(f"""
atm     {fix}/test.atm
linedb  {out}
molfile {fix}/molecules.dat
wnlow   3020
wnhigh  3070
wndelt  1.0
wnosamp 216
wnfct   1.0
ndop 15
nlor 15
solution eclipse
toomuch 1e30
raygrid 0 40 80
outspec {tmp_path}/spec.dat
verb 1
""")
    res = subprocess.run([binpath, "-c", str(cfg)], cwd=tmp_path,
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr[-1500:]
    d = np.loadtxt(tmp_path / "spec.dat")
    assert d.shape[0] == 51
    assert np.all(np.isfinite(d))


def test_read_tli_band():
    """Band-windowed TLI reads match the full read filtered."""
    from transit_tpu.io.tli import read_tli, read_tli_band
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "test.tli")
    full = read_tli(path)
    lo, hi = 4.80, 4.95
    band = read_tli_band(path, lo, hi)
    keep = (full.wl >= lo) & (full.wl <= hi)
    np.testing.assert_array_equal(band.wl, full.wl[keep])
    np.testing.assert_array_equal(band.isoid, full.isoid[keep])
    np.testing.assert_array_equal(band.gf, full.gf[keep])
    assert band.isotran.sum() == keep.sum()
    assert len(band.databases) == len(full.databases)


def test_hitran_streaming_chunks_match_full_read(tmp_path):
    """The chunked binary-search reader (HITEMP-scale route,
    driver.py:39-118 analogue) must return exactly the window's lines
    regardless of chunk size, including inclusive boundaries."""
    p = tmp_path / "06_stream.par"
    wns = [2000.0 + 2.5 * i for i in range(40)]
    with open(p, "w") as f:
        for i, wn in enumerate(wns):
            f.write(make_par_line(6, 1 + (i % 3), wn, 1e-20, 2.5,
                                  100.0 + i, 11.0))
    r = HitranReader(str(p))
    iwl, fwl = 1e4 / 2070.0, 1e4 / 2010.0      # microns
    wl_full, gf_full, el_full, iso_full = r.read(iwl, fwl)
    # All chunk sizes give identical results:
    for chunk in (1, 3, 7, 1000):
        r.CHUNK_RECORDS = chunk
        wl, gf, el, iso = r.read(iwl, fwl)
        np.testing.assert_array_equal(wl, wl_full)
        np.testing.assert_array_equal(gf, gf_full)
        np.testing.assert_array_equal(el, el_full)
        np.testing.assert_array_equal(iso, iso_full)
    got_wn = np.sort(1e4 / wl_full)
    # The window bounds go through the same wl->wn round-trip the reader
    # applies (1/(fwl*MTC) = 2010.0000000000002 here, excluding 2010.0):
    iwn, fwn = 1.0 / (fwl * 1e-4), 1.0 / (iwl * 1e-4)
    expect = [w for w in wns if iwn <= w <= fwn]
    np.testing.assert_allclose(got_wn, expect, rtol=1e-9)


def test_hitran_streaming_empty_window(tmp_path):
    p = tmp_path / "06_empty.par"
    p.write_text(make_par_line(6, 1, 3030.0, 1e-20, 2.5, 100.0, 11.0))
    r = HitranReader(str(p))
    wl, gf, el, iso = r.read(1e4 / 5000.0, 1e4 / 4000.0)
    assert wl.shape == (0,) and iso.dtype == np.int16


def test_band_reader_beyond_4gib_offsets(tmp_path):
    """>4 GiB file-offset pin for read_tli_band (the 1e9-line regime,
    VERDICT r3 item 3): a 300M-line TLI is laid out SPARSELY — the line
    blocks are file holes (reading as 0.0/0) except a real sorted
    wavelength window at the END of the block, so the per-isotope
    bisection stays correct (holes < window values) while the gf block's
    window bytes sit beyond offset 4 GiB.  u32 truncation anywhere in
    the offset arithmetic would read the wrong bytes."""
    import struct
    from transit_tpu.io.tli import (read_tli_band, read_tli_header,
                                    TliData, TliDatabase, TliIsotope,
                                    write_tli)

    path = str(tmp_path / "huge.tli")
    nlines = 300_000_000
    k = 1000                       # real lines at the end of the block
    wl_win = np.linspace(3.0, 3.1, k)
    gf_win = 10.0 ** np.linspace(-8.0, -4.0, k)
    el_win = np.linspace(100.0, 2100.0, k)

    # Header via the normal writer on an empty list, then patch the
    # line-section sizes and punch the sparse blocks:
    t_pf = np.array([100.0, 300.0])
    data = TliData(version=6, iwav=0.5, fwav=4.0, databases=[
        TliDatabase("syn", "CH4", t_pf,
                    [TliIsotope("a", 16.0, 1.0, np.array([1.0, 2.0]))])],
        wl=np.zeros(0), isoid=np.zeros(0, np.int16), elow=np.zeros(0),
        gf=np.zeros(0), isotran=np.array([0], dtype=np.uint64))
    write_tli(path, data)
    hdr = read_tli_header(path)
    data_off = hdr["_line_layout"][0]
    with open(path, "r+b") as f:
        # Patch nlines (u64 at data_off-20) and isotran[0] (u64 at
        # data_off-8); the i32 isotope count between them stays 1:
        f.seek(data_off - 20)
        f.write(struct.pack("<Q", nlines))
        f.seek(data_off - 8)
        f.write(struct.pack("<Q", nlines))
        wl_off = data_off
        iso_off = wl_off + 8 * nlines
        el_off = iso_off + 2 * nlines
        gf_off = el_off + 8 * nlines
        end = gf_off + 8 * nlines
        assert gf_off + 8 * (nlines - k) > 4 * 2 ** 30
        f.seek(wl_off + 8 * (nlines - k))
        f.write(wl_win.astype("<f8").tobytes())
        f.seek(el_off + 8 * (nlines - k))
        f.write(el_win.astype("<f8").tobytes())
        f.seek(gf_off + 8 * (nlines - k))
        f.write(gf_win.astype("<f8").tobytes())
        f.truncate(end)
    # Sparse: ~7.8 GB apparent, a few MB on disk:
    assert os.path.getsize(path) == end
    assert os.stat(path).st_blocks * 512 < 50 * 2 ** 20

    band = read_tli_band(path, 3.0, 3.1)
    assert band.n_lines == k
    np.testing.assert_array_equal(band.wl, wl_win)
    np.testing.assert_array_equal(band.gf, gf_win)
    np.testing.assert_array_equal(band.elow, el_win)
    assert np.all(band.isoid == 0)
    # A window bisecting into the hole returns nothing, not garbage:
    assert read_tli_band(path, 2.0, 2.9).n_lines == 0


def test_bisect_mm_matches_searchsorted():
    """bisect_mm (the unaligned/strided-safe searchsorted replacement)
    must agree with np.searchsorted on both sides for edge cases:
    duplicates, out-of-range probes, empty blocks."""
    from transit_tpu.io.tli import bisect_mm
    rng = np.random.default_rng(2)
    blk = np.sort(rng.uniform(0.0, 10.0, 500))
    blk[100:110] = blk[100]                 # duplicates
    blk = np.sort(blk)
    probes = np.concatenate([rng.uniform(-1.0, 11.0, 200),
                             blk[[0, 99, 100, 250, 499]],
                             [blk[0] - 1, blk[-1] + 1]])
    for x in probes:
        for side in ("left", "right"):
            assert bisect_mm(blk, x, side) == int(
                np.searchsorted(blk, x, side=side)), (x, side)
    assert bisect_mm(np.empty(0), 1.0) == 0
