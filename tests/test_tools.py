import numpy as np
import pytest

from transit_tpu.io.crosssec import read_cross_section
from transit_tpu.tools import ciaformat


def test_borysow_roundtrip(tmp_path):
    temps = [400.0, 1000.0, 3000.0]
    src = tmp_path / "borysow.dat"
    lines = ["# Borysow-style table",
             "T(K):  " + "  ".join(f"{t:.0f}K" for t in temps)]
    wn = np.arange(100.0, 200.0, 10.0)
    vals = np.outer(wn, np.array(temps)) * 1e-9
    for i, w in enumerate(wn):
        lines.append(f"{w:10.2f} " + " ".join(f"{v:.5e}" for v in vals[i]))
    src.write_text("\n".join(lines) + "\n")

    out = tmp_path / "out.dat"
    ciaformat.borysow_to_cs(str(src), str(out), "H2", "He")
    tb = read_cross_section(str(out))
    assert tb.species == ["H2", "He"]
    np.testing.assert_allclose(tb.temps, temps)
    np.testing.assert_allclose(tb.wn, wn)
    np.testing.assert_allclose(tb.cs, vals, rtol=1e-4)


def test_hitran_cia_roundtrip(tmp_path):
    src = tmp_path / "H2-H2_2011.cia"
    wn = np.arange(20.0, 120.0, 20.0)
    temps = [200.0, 400.0]
    with open(src, "w") as f:
        for t in temps:
            f.write(f"H2-H2 {wn[0]:.1f} {wn[-1]:.1f} {len(wn)} {t:.1f} "
                    "2.0e-07 0.5\n")
            for w in wn:
                f.write(f" {w:.3f} {1e-8 * w * t / 1e4:.5e}\n")
    out = tmp_path / "out.dat"
    ciaformat.hitran_cia_to_cs(str(src), str(out))
    tb = read_cross_section(str(out))
    assert tb.species == ["H2", "H2"]
    np.testing.assert_allclose(tb.temps, temps)
    np.testing.assert_allclose(tb.cs[:, 0], 1e-8 * wn * 200.0 / 1e4,
                               rtol=1e-4)


def test_parse_real_borysow_converted_files():
    """The reference's shipped CS inputs parse with our reader."""
    import os
    path = "/root/reference/inputs/CIA_Borysow_H2He_1000-7000K_0.5-400um.dat"
    if not os.path.exists(path):
        pytest.skip("reference inputs not mounted")
    tb = read_cross_section(path)
    assert tb.species == ["H2", "He"]
    assert tb.temps[0] >= 1000.0
    assert tb.cs.shape == (tb.wn.shape[0], tb.temps.shape[0])


def test_merge_cs(tmp_path):
    wn = np.arange(10.0, 50.0, 10.0)
    for name, temps in (("a.dat", [100.0, 200.0]), ("b.dat", [400.0])):
        vals = np.ones((wn.shape[0], len(temps))) * temps
        ciaformat.write_cs(str(tmp_path / name), ["H2", "H2"],
                           np.array(temps), wn, vals)
    ciaformat.merge_cs(str(tmp_path / "a.dat"), str(tmp_path / "b.dat"),
                       str(tmp_path / "m.dat"))
    tb = read_cross_section(str(tmp_path / "m.dat"))
    np.testing.assert_allclose(tb.temps, [100.0, 200.0, 400.0])
    np.testing.assert_allclose(tb.cs[0], [100.0, 200.0, 400.0], rtol=1e-4)


def test_read_spectrum(tmp_path):
    p = tmp_path / "spec.dat"
    p.write_text("#wvl [um]      Flux\n5.0 10.0\n4.0 20.0\n")
    wn, spec = ciaformat.read_spectrum(str(p))
    np.testing.assert_allclose(wn, [2000.0, 2500.0])
    np.testing.assert_allclose(spec, [10.0, 20.0])


def _write_xsc(path, mol, wn_init, wn_fin, nwave, temp, vals):
    """Synthetic HITRAN .xsc (Hargreaves-style header fields at the
    fixed column offsets of scripts/HITRAN_CS_format.py:29-60, data
    wrapped 10 per line)."""
    hdr = (f"{mol:<20s}{wn_init:<10.1f}{wn_fin:<10.1f}{nwave:<7d}"
           f"{temp:<7.1f}{760.0:<6.1f}{'':10s}{0.01:<5.2f}")
    lines = [hdr]
    for i in range(0, nwave, 10):
        lines.append(" ".join(f"{v:.4e}" for v in vals[i:i + 10]))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_hitran_xsc_to_cs(tmp_path):
    wn_init, wn_fin, nwave = 1200.0, 1400.0, 27
    wn = np.linspace(wn_init, wn_fin, nwave)
    temps = [300.0, 500.0]
    files = []
    for t in temps:
        vals = 1e-22 * (wn / 1000.0) * (t / 300.0)
        p = tmp_path / f"CH4_{t:.0f}K.xsc"
        _write_xsc(str(p), "CH4", wn_init, wn_fin, nwave, t, vals)
        files.append(str(p))
    out = tmp_path / "out.dat"
    # Files deliberately in reverse order: converter must sort by T.
    ciaformat.hitran_xsc_to_cs(files[::-1], str(out))
    tb = read_cross_section(str(out))
    assert tb.species == ["CH4"]
    np.testing.assert_allclose(tb.temps, temps)
    np.testing.assert_allclose(tb.wn, wn, atol=0.005)  # %10.2f format
    np.testing.assert_allclose(
        tb.cs[:, 0], 1e-22 * (wn / 1000.0) * ciaformat.N0, rtol=1e-3)
    np.testing.assert_allclose(
        tb.cs[:, 1], 1e-22 * (wn / 1000.0) * (500.0 / 300.0)
        * ciaformat.N0, rtol=1e-3)


def test_hitran_xsc_cli(tmp_path):
    wn = np.linspace(100.0, 110.0, 11)
    p = tmp_path / "x.xsc"
    _write_xsc(str(p), "CO2", 100.0, 110.0, 11, 250.0, np.ones(11) * 1e-21)
    out = tmp_path / "o.dat"
    assert ciaformat.main(["hitran-xsc", str(p), str(out)]) == 0
    tb = read_cross_section(str(out))
    assert tb.species == ["CO2"]


def test_hitran_xsc_mismatch_raises(tmp_path):
    a, b = tmp_path / "a.xsc", tmp_path / "b.xsc"
    _write_xsc(str(a), "CH4", 100.0, 110.0, 11, 250.0, np.ones(11))
    _write_xsc(str(b), "CO2", 100.0, 110.0, 11, 300.0, np.ones(11))
    with pytest.raises(ValueError):
        ciaformat.hitran_xsc_to_cs([str(a), str(b)], str(tmp_path / "o"))
