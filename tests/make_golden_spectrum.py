"""Generate conformance fixtures and golden outputs.

Creates a self-contained synthetic workload (line list, atmosphere, CIA
table, config) in tests/fixtures/, runs the *reference* C transit binary on
it (built out-of-tree, path via TRANSIT_REF_BIN), and stores the reference's
spectrum / tau / per-layer extinction as golden .npz files in tests/golden/.

Run manually when fixtures change:
    TRANSIT_REF_BIN=/tmp/refbuild/transit/transit python tests/make_golden_spectrum.py
"""

import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures")
GOLD = os.path.join(HERE, "golden")
sys.path.insert(0, os.path.dirname(HERE))

from transit_tpu.io.tli import (TliData, TliDatabase, TliIsotope, write_tli,
                                sort_lines)


def make_molecules():
    txt = """# Minimal molecular info (values from public compilations)
# ID    Molecule  Mass         Diameter  src  Polarizability
   2    He         4.0026020   2.0       01    0.208
 105    H2         2.01588     2.89      02    0.787
 102    CH4       16.0425      4.0       01    2.448
"""
    with open(os.path.join(FIX, "molecules.dat"), "w") as f:
        f.write(txt)


def make_atm(nl=20):
    rng = np.random.default_rng(42)
    press = np.logspace(1, -5, nl)           # bar, bottom-up (descending)
    temp = 1500.0 + 150.0 * np.tanh((np.log10(press) - 0.5)) \
        + 20.0 * np.sin(np.linspace(0, 3, nl))
    radius = 90000.0 + np.cumsum(np.full(nl, 120.0) +
                                 rng.uniform(-10, 10, nl))  # km, ascending
    qch4 = 1e-3 * (1.0 + 0.2 * np.sin(np.linspace(0, 2, nl)))
    qhe = np.full(nl, 0.15)
    qh2 = 1.0 - qhe - qch4
    with open(os.path.join(FIX, "test.atm"), "w") as f:
        f.write("# Synthetic conformance atmosphere\n"
                "ur 1e5\nup 1e6\nq number\n\n#SPECIES\nHe H2 CH4\n\n"
                "#Radius    Pressure   Temp       He    H2    CH4\n")
        for i in range(nl):
            f.write(f" {radius[i]:.3f} {press[i]:.6e} {temp[i]:.2f} "
                    f"{qhe[i]:.8e} {qh2[i]:.8e} {qch4[i]:.8e}\n")


def make_cia():
    wn = np.arange(1800.0, 2301.0, 10.0)
    temps = np.array([400., 600., 900., 1300., 1800., 2400., 3000.])
    with open(os.path.join(FIX, "test_cia.dat"), "w") as f:
        f.write("# Synthetic H2-H2 CIA\ni H2 H2\nt " +
                " ".join(f"{t:.0f}" for t in temps) + "\n\n")
        for w in wn:
            vals = (1e-7 * np.exp(-((w - 2000.0) / 300.0) ** 2) *
                    np.sqrt(temps / 1000.0) * (1 + 0.1 * np.sin(w / 37.0)))
            f.write(f" {w:9.2f}  " +
                    " ".join(f"{v:.6e}" for v in vals) + "\n")


def make_tli():
    rng = np.random.default_rng(7)
    temps = np.arange(70.0, 3020.0, 50.0)
    z1 = 120.0 * (temps / 296.0) ** 1.5
    z2 = 240.0 * (temps / 296.0) ** 1.45

    n1, n2 = 400, 150
    wn_1 = rng.uniform(1990.0, 2110.0, n1)
    # Clusters of near-degenerate lines to exercise co-adding:
    wn_1[:40] = 2050.0 + rng.uniform(-0.001, 0.001, 40)
    wn_1[40:60] = 2033.3 + rng.uniform(-0.0005, 0.0005, 20)
    wn_2 = rng.uniform(1995.0, 2105.0, n2)
    wn = np.concatenate([wn_1, wn_2])
    isoid = np.concatenate([np.zeros(n1, np.int16), np.ones(n2, np.int16)])
    gf = 10.0 ** rng.uniform(-9, -1, n1 + n2)   # wide range -> ethresh hits
    elow = rng.uniform(0.0, 4000.0, n1 + n2)
    wl = 1e4 / wn                                # microns

    wl, isoid, elow, gf, isotran = sort_lines(wl, isoid, elow, gf)
    iso1 = TliIsotope("CH4-1", 16.0425, 0.98842, z1)
    iso2 = TliIsotope("CH4-2", 17.0423, 0.01110, z2)
    db = TliDatabase("synthetic-ch4", "CH4", temps, [iso1, iso2])
    data = TliData(version=6, iwav=float(wl.min()), fwav=float(wl.max()),
                   databases=[db], wl=wl, isoid=isoid, elow=elow, gf=gf,
                   isotran=isotran)
    write_tli(os.path.join(FIX, "test.tli"), data)


def make_multi():
    """Second fixture: two databases (CH4 + H2O), four species."""
    rng = np.random.default_rng(21)
    nl = 16
    press = np.logspace(0.5, -4, nl)
    temp = 1450.0 + 120.0 * np.tanh(np.log10(press))
    radius = 91000.0 + np.cumsum(np.full(nl, 150.0))
    qch4 = np.full(nl, 4e-4)
    qh2o = np.full(nl, 2e-4)
    qhe = np.full(nl, 0.15)
    qh2 = 1.0 - qhe - qch4 - qh2o
    with open(os.path.join(FIX, "multi.atm"), "w") as f:
        f.write("# multi-species atmosphere\nur 1e5\nup 1e6\nq number\n\n"
                "#SPECIES\nHe H2 CH4 H2O\n\n#DATA\n")
        for i in range(nl):
            f.write(f" {radius[i]:.3f} {press[i]:.6e} {temp[i]:.2f} "
                    f"{qhe[i]:.8e} {qh2[i]:.8e} {qch4[i]:.8e} "
                    f"{qh2o[i]:.8e}\n")
    with open(os.path.join(FIX, "molecules_multi.dat"), "w") as f:
        f.write("# ID name mass diam src pol\n"
                "   2    He         4.0026020   2.0   01  0.208\n"
                " 105    H2         2.01588     2.89  02  0.787\n"
                " 102    CH4       16.0425      4.0   01  2.448\n"
                " 101    H2O       18.01528     3.2   01  1.501\n")

    temps = np.arange(70.0, 3020.0, 50.0)
    dbs = []
    all_wl, all_iso, all_elow, all_gf = [], [], [], []
    offset = 0
    for name, mol, isos, nlines, span in (
            ("synth-ch4", "CH4",
             [("CH4-1", 16.0425, 0.98842), ("CH4-2", 17.0423, 0.0111)],
             300, (1992.0, 2108.0)),
            ("synth-h2o", "H2O",
             [("H2O-1", 18.010565, 0.9973)], 180, (1990.0, 2110.0))):
        tli_isos = []
        for k, (iname, mass, ratio) in enumerate(isos):
            z = (100.0 + 30 * k) * (temps / 296.0) ** (1.5 - 0.1 * k)
            tli_isos.append(TliIsotope(iname, mass, ratio, z))
        dbs.append(TliDatabase(name, mol, temps, tli_isos))
        wn = rng.uniform(*span, nlines)
        all_wl.append(1e4 / wn)
        all_iso.append(offset + (rng.integers(0, len(isos), nlines)
                                 ).astype(np.int16))
        all_elow.append(rng.uniform(0, 3500.0, nlines))
        all_gf.append(10.0 ** rng.uniform(-8, -2, nlines))
        offset += len(isos)
    wl = np.concatenate(all_wl)
    isoid = np.concatenate(all_iso)
    elow = np.concatenate(all_elow)
    gf = np.concatenate(all_gf)
    wl, isoid, elow, gf, isotran = sort_lines(wl, isoid, elow, gf)
    write_tli(os.path.join(FIX, "multi.tli"),
              TliData(version=6, iwav=float(wl.min()), fwav=float(wl.max()),
                      databases=dbs, wl=wl, isoid=isoid, elow=elow, gf=gf,
                      isotran=isotran))


CFG_MULTI = """
atm     {fix}/multi.atm
linedb  {fix}/multi.tli
csfile  {fix}/test_cia.dat
molfile {fix}/molecules_multi.dat
wnlow   2000
wnhigh  2100
wndelt  1.0
wnosamp 216
wnfct   1.0
ndop    15
nlor    15
nwidth  20
ethresh 1e-8
verb    1
"""


CFG_COMMON = """
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
"""


def parse_2d_file(path, tag="wavenumber:"):
    """Parse print2dArrayDouble/save1Darray output: 'tag v' + value rows."""
    keys, rows = [], []
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    i = 0
    while i < len(lines):
        s = lines[i]
        if s.startswith(tag):
            keys.append(float(s.split()[1]))
            i += 1
            rows.append([float(v) for v in lines[i].split()])
        i += 1
    return np.array(keys), np.array(rows)


def parse_spectrum(path):
    d = np.loadtxt(path)
    return d[:, 0], d[:, 1]


def run_reference(cfg_text, outdir, solution, toomuch, extra=""):
    os.makedirs(outdir, exist_ok=True)
    cfg = cfg_text + (f"solution {solution}\ntoomuch {toomuch}\n"
                      f"outspec {outdir}/spec.dat\n"
                      f"outtoomuch {outdir}/toomuch.dat\n"
                      f"savefiles yes\n" + extra)
    cfgpath = os.path.join(outdir, "run.cfg")
    with open(cfgpath, "w") as f:
        f.write(cfg)
    binpath = os.environ.get("TRANSIT_REF_BIN", "/tmp/refbuild/transit/transit")
    subprocess.run([binpath, "-c", cfgpath], cwd=outdir, check=True,
                   capture_output=True)
    wl, spec = parse_spectrum(os.path.join(outdir, "spec.dat"))
    wn_tau, tau = parse_2d_file(os.path.join(outdir, "tau.dat"))
    rad_ext, ext = parse_2d_file(os.path.join(outdir, "mol_extion.dat"),
                                 tag="radius:")
    wn_cia, cia = parse_2d_file(os.path.join(outdir, "CIA.dat"))
    return dict(wl=wl, spec=spec, wn_tau=wn_tau, tau=tau,
                rad_ext=rad_ext, ext=ext, wn_cia=wn_cia, cia=cia)


def main():
    os.makedirs(FIX, exist_ok=True)
    os.makedirs(GOLD, exist_ok=True)
    make_molecules()
    make_atm()
    make_cia()
    make_tli()
    cfg = CFG_COMMON.format(fix=FIX)

    # Eclipse, huge toomuch (all layers computed):
    r = run_reference(cfg, "/tmp/goldrun_ecl", "eclipse", 1e30,
                      extra="raygrid 0 20 40 60 80\n"
                            "outintens /tmp/goldrun_ecl/intens.dat\n")
    intens = np.loadtxt("/tmp/goldrun_ecl/intens.dat")
    np.savez_compressed(os.path.join(GOLD, "ref_eclipse.npz"),
                        intens=intens, **r)

    # Eclipse with active toomuch masking:
    r = run_reference(cfg, "/tmp/goldrun_ecl2", "eclipse", 3.0,
                      extra="raygrid 0 40 80\n")
    np.savez_compressed(os.path.join(GOLD, "ref_eclipse_toomuch.npz"), **r)

    # Transit geometry:
    r = run_reference(cfg, "/tmp/goldrun_tra", "transit", 1e30)
    np.savez_compressed(os.path.join(GOLD, "ref_transit.npz"), **r)

    r = run_reference(cfg, "/tmp/goldrun_tra2", "transit", 5.0)
    np.savez_compressed(os.path.join(GOLD, "ref_transit_toomuch.npz"), **r)

    # Opacity grid: build with --justOpacity, then run in grid-interpolation
    # mode (opacity.c modes b and c):
    binpath = os.environ.get("TRANSIT_REF_BIN",
                             "/tmp/refbuild/transit/transit")
    os.makedirs("/tmp/goldrun_grid", exist_ok=True)
    gridcfg = cfg + ("solution eclipse\ntoomuch 1e30\n"
                     "opacityfile /tmp/goldrun_grid/opacity.bin\n"
                     "tlow 1000\nthigh 2000\ntempdelt 100\n"
                     "raygrid 0 20 40 60 80\n"
                     "outspec /tmp/goldrun_grid/spec.dat\njustOpacity y\n")
    with open("/tmp/goldrun_grid/build.cfg", "w") as f:
        f.write(gridcfg)
    if os.path.exists("/tmp/goldrun_grid/opacity.bin"):
        os.remove("/tmp/goldrun_grid/opacity.bin")
    subprocess.run([binpath, "-c", "/tmp/goldrun_grid/build.cfg"],
                   cwd="/tmp/goldrun_grid", check=True, capture_output=True)
    import shutil
    shutil.copy("/tmp/goldrun_grid/opacity.bin",
                os.path.join(GOLD, "ref_opacity_grid.bin"))

    r = run_reference(cfg + "opacityfile /tmp/goldrun_grid/opacity.bin\n"
                      "tlow 1000\nthigh 2000\ntempdelt 100\n",
                      "/tmp/goldrun_grid_run", "eclipse", 1e30,
                      extra="raygrid 0 20 40 60 80\n")
    np.savez_compressed(os.path.join(GOLD, "ref_eclipse_gridmode.npz"), **r)

    # Resampled radius grid + extinction savefile:
    r = run_reference(cfg + "raddelt 25.0\n",
                      "/tmp/goldrun_raddelt", "eclipse", 1e30,
                      extra="raygrid 0 40 80\n"
                            "saveext /tmp/goldrun_raddelt/ext.save\n")
    np.savez_compressed(os.path.join(GOLD, "ref_eclipse_raddelt.npz"), **r)
    shutil.copy("/tmp/goldrun_raddelt/ext.save",
                os.path.join(GOLD, "ref_ext.save"))

    # Scattering + cloud conformance.  Well-defined subset only: both
    # Rayleigh flags read just p/T/pol, and cloud model 1 reads just the
    # pressure array.  Cloud models 2-5 multiply the reference's
    # *uninitialized* mean_dens stack array (tau.c:129 declares it, 203
    # accumulates without zeroing — UB), so they cannot be pinned to the
    # binary; transit_tpu computes the intended quantity (documented in
    # model.py) and pins those models with unit tests instead.
    r = run_reference(cfg, "/tmp/goldrun_scat1", "eclipse", 1e30,
                      extra="raygrid 0 40 80\nscattering 0.5\n")
    np.savez_compressed(os.path.join(GOLD, "ref_eclipse_scat.npz"), **r)
    r = run_reference(cfg, "/tmp/goldrun_scat2", "transit", 1e30,
                      extra="scattering polar\n")
    np.savez_compressed(os.path.join(GOLD, "ref_transit_polar.npz"), **r)
    r = run_reference(cfg, "/tmp/goldrun_cloud1", "transit", 1e30,
                      extra="cloud ext,1e-8,-1.0,1.5\n")
    np.savez_compressed(os.path.join(GOLD, "ref_transit_cloud1.npz"), **r)

    # Detail outputs (detailout, tau.c:525-605): selected-wavenumber
    # columns of tau (vs impact parameter), extinction and CIA (vs
    # radius):
    ddir = "/tmp/goldrun_detail"
    r = run_reference(cfg, ddir, "eclipse", 1e30,
                      extra="raygrid 0 40 80\n"
                            f"detailtau {ddir}/dtau.dat:2040.5,2070\n"
                            f"detailext {ddir}/dext.dat:2025,2050\n"
                            f"detailcia {ddir}/dcia.dat:2060\n")
    det = {}
    for k in ("dtau", "dext", "dcia"):
        with open(f"{ddir}/{k}.dat") as f:
            head = f.readline().split("=>")[1].split()
        det[k + "_wn"] = np.array([float(v) for v in head])
        det[k] = np.loadtxt(f"{ddir}/{k}.dat", skiprows=1)
    np.savez_compressed(os.path.join(GOLD, "ref_detail.npz"), **det)

    # Multi-database / multi-molecule fixture:
    make_multi()
    mcfg = CFG_MULTI.format(fix=FIX)
    r = run_reference(mcfg, "/tmp/goldrun_multi", "eclipse", 1e30,
                      extra="raygrid 0 40 80\n")
    np.savez_compressed(os.path.join(GOLD, "ref_multi_eclipse.npz"), **r)
    r = run_reference(mcfg, "/tmp/goldrun_multi_t", "transit", 1e30)
    np.savez_compressed(os.path.join(GOLD, "ref_multi_transit.npz"), **r)

    print("golden files written to", GOLD)


if __name__ == "__main__":
    main()
