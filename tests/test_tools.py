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
