import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_conformance import FIX, GOLD
from tests.make_golden_spectrum import parse_2d_file, parse_spectrum

CFG = """
atm     {fix}/test.atm
linedb  {fix}/test.tli
csfile  {fix}/test_cia.dat
molfile {fix}/molecules.dat
wnlow   2000
wnhigh  2100
wndelt  1.0
wnosamp 216
wnfct   1.0
ndop    15
nlor    15
dmin    1e-3
dmax    0.25
lmin    1e-4
lmax    10.0
nwidth  20
ethresh 1e-8
verb    1
solution eclipse
toomuch 1e30
raygrid 0 20 40 60 80
savefiles yes
"""


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("cli")
    cfgpath = outdir / "run.cfg"
    cfgpath.write_text(
        CFG.format(fix=FIX) +
        f"outspec {outdir}/spec.dat\n"
        f"outtoomuch {outdir}/toomuch.dat\n"
        f"outintens {outdir}/intens.dat\n"
        f"outsample {outdir}/sample.dat\n")
    # Subprocess runs with cwd=outdir; make the repo importable even when
    # transit_tpu isn't pip-installed in the environment:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=pypath)
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "jax.config.update('jax_enable_x64', True); "
         "from transit_tpu.cli import main; import sys; "
         f"sys.exit(main(['-c', '{cfgpath}']))"],
        cwd=outdir, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return outdir


def test_cli_spectrum(cli_run):
    g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
    wl, spec = parse_spectrum(cli_run / "spec.dat")
    np.testing.assert_allclose(spec, g["spec"], rtol=1e-5)
    np.testing.assert_allclose(wl, g["wl"], rtol=1e-9)


def test_cli_savefiles(cli_run):
    g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
    _, tau = parse_2d_file(cli_run / "tau.dat")
    np.testing.assert_allclose(tau, g["tau"], rtol=5e-5,
                               atol=g["tau"].max() * 1e-10)
    _, cia = parse_2d_file(cli_run / "CIA.dat")
    np.testing.assert_allclose(cia, g["cia"], rtol=1e-7,
                               atol=abs(g["cia"]).max() * 1e-9)
    _, ext = parse_2d_file(cli_run / "mol_extion.dat", tag="radius:")
    np.testing.assert_allclose(ext, g["ext"], rtol=5e-5,
                               atol=g["ext"].max() * 1e-10)


def test_cli_savefiles_extinction_dumps(cli_run):
    """total/cloud/scatt_extion.dat (tau.c:179-190, 293-296): streamed
    per-wavenumber dumps; with no clouds or scattering configured the
    total must equal mol-line + CIA and the other two must be zero."""
    g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
    wt, total = parse_2d_file(cli_run / "total_extion.dat")
    _, cloud = parse_2d_file(cli_run / "cloud_extion.dat")
    _, scatt = parse_2d_file(cli_run / "scatt_extion.dat")
    expect = g["ext"].T + g["cia"]
    np.testing.assert_allclose(total, expect, rtol=5e-5,
                               atol=abs(expect).max() * 1e-9)
    assert np.all(cloud == 0.0) and cloud.shape == total.shape
    assert np.all(scatt == 0.0) and scatt.shape == total.shape
    # Header quirk parity: the streamed files open with a blank line
    # then the two-line header (openFile, tau.c:331-338):
    head = (cli_run / "total_extion.dat").read_text()[:60]
    assert head.startswith("\n# 2D total extinction\n")


def test_cli_outsample_blocks(cli_run):
    """outsample writes all four printsample blocks (makesample.c:
    743-772), including the radius/ip values arrays and the reference's
    zeroed Wavelength block (tr->wavs is never populated)."""
    text = (cli_run / "sample.dat").read_text()
    for name in ("Wavenumber", "Wavelength", "Radius", "Impact parameter"):
        assert f"   {name:<12} Sampling" in text, name
    blocks = text.split("############################\n")[1:]
    rad = next(b for b in blocks if b.startswith("   Radius"))
    ip = next(b for b in blocks if b.startswith("   Impact"))
    rv = np.array([float(v) for v in
                   rad.split("Values:")[1].split()])
    iv = np.array([float(v) for v in
                   ip.split("Values:")[1].split()])
    assert len(rv) == len(iv) > 1
    np.testing.assert_allclose(iv, rv[::-1], rtol=1e-6)
    assert "Oversample" not in rad          # TRF_NOOVERSAMP
    assert "Oversample: 0" in ip            # makeipsample sets o=0
    wav = next(b for b in blocks if b.startswith("   Wavelength"))
    assert "Number of elements: 0" in wav


def test_cli_intensity(cli_run):
    g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
    d = np.loadtxt(cli_run / "intens.dat")
    np.testing.assert_allclose(d[:, 1:], g["intens"][:, 1:], rtol=1e-5)


def test_cli_toomuch_file(cli_run):
    # The reference's header is two lines, only the first '#'-prefixed
    # (tau.c:631-633) — replicated faithfully, so skip both:
    d = np.loadtxt(cli_run / "toomuch.dat", skiprows=2)
    assert d.shape[1] == 4
    assert np.all(d[:, 1] > 0)


def test_cli_flag_overrides(tmp_path):
    """CLI flags override config-file values (procopt precedence)."""
    from transit_tpu.cli import config_from_args
    cfgpath = tmp_path / "c.cfg"
    cfgpath.write_text("toomuch 5\nsolution eclipse\nwnlow 2000\n")
    cfg, mode, bands = config_from_args(
        ["-c", str(cfgpath), "--toomuch", "9",
                                  "--solution", "transit"])
    assert cfg.toomuch == 9.0
    assert cfg.solution == "transit"
    assert cfg.wnlow == 2000.0
    assert mode == "exact"
