"""Golden for the demo-shaped conformance run.

The reference's de-facto integration test is its shipped CH4 demo
(README.md:55-104, transit/examples/demo/transit_demo.cfg): the
HD209458b_demo.atm 100-layer / 10-species atmosphere, the real Borysow
H2-H2 CIA table, eclipse with raygrid 0-80, toomuch 10 (active),
ethresh 1e-50, wnosamp 2160.  The HITRAN-2012 CH4 line list itself is a
download (not in the tree), so this golden substitutes a synthetic CH4
line list over a 3.2-3.6 um window of the demo's 2-4 um range; every
other input is the reference's own shipped file.

Run manually (needs a reference build, see CLAUDE.md):
    TRANSIT_REF_BIN=/tmp/refbuild/transit/transit python tests/make_golden_demo.py
"""

import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures")
GOLD = os.path.join(HERE, "golden")
REF = "/root/reference"
sys.path.insert(0, os.path.dirname(HERE))

from transit_tpu.io.tli import (TliData, TliDatabase, TliIsotope, write_tli,
                                sort_lines)

DEMO_ATM = f"{REF}/transit/examples/demo/HD209458b_demo.atm"
DEMO_CIA = f"{REF}/inputs/CIA_H2H2_400-7000K.dat"
DEMO_MOL = f"{REF}/inputs/molecules.dat"

WL_LO, WL_HI = 3.2, 3.6          # um (inside the demo's 2-4 um band)


def make_demo_tli():
    """Synthetic CH4 band standing in for the HITRAN-2012 download."""
    rng = np.random.default_rng(2012)
    temps = np.arange(70.0, 3010.0, 10.0)           # TIPS-like grid
    z1 = 590.0 * (temps / 296.0) ** 1.62            # CH4-like Q(T)
    z2 = 1180.0 * (temps / 296.0) ** 1.62

    n1, n2 = 4000, 1000
    wn_lo, wn_hi = 1e4 / WL_HI, 1e4 / WL_LO
    # Band-like clustering around a Q-branch:
    wn_1 = np.concatenate([
        rng.uniform(wn_lo - 15, wn_hi + 15, n1 - 600),
        3018.0 + rng.normal(0.0, 2.0, 600)])        # dense Q branch
    wn_2 = rng.uniform(wn_lo - 10, wn_hi + 10, n2)
    wn = np.concatenate([wn_1, wn_2])
    isoid = np.concatenate([np.zeros(n1, np.int16), np.ones(n2, np.int16)])
    gf = 10.0 ** rng.uniform(-9, -2, n1 + n2)
    elow = rng.uniform(0.0, 3000.0, n1 + n2)
    wl = 1e4 / wn
    wl, isoid, elow, gf, isotran = sort_lines(wl, isoid, elow, gf)
    iso1 = TliIsotope("CH4-211", 16.0425, 0.98842, z1)
    iso2 = TliIsotope("CH4-311", 17.0423, 0.01110, z2)
    db = TliDatabase("demo-ch4", "CH4", temps, [iso1, iso2])
    write_tli(os.path.join(FIX, "demo_ch4.tli"),
              TliData(version=6, iwav=float(wl.min()), fwav=float(wl.max()),
                      databases=[db], wl=wl, isoid=isoid, elow=elow, gf=gf,
                      isotran=isotran))


CFG = f"""
atm     {DEMO_ATM}
linedb  {FIX}/demo_ch4.tli
csfile  {DEMO_CIA}
molfile {DEMO_MOL}
wllow   {WL_LO}
wlhigh  {WL_HI}
wlfct   1e-4
wndelt  1.0
wnosamp 2160
wnfct   1.0
solution eclipse
raygrid 0 20 40 60 80
toomuch 10
ethresh 1e-50
nwidth  20
verb    1
"""


def main():
    os.makedirs(GOLD, exist_ok=True)
    make_demo_tli()
    outdir = "/tmp/goldrun_demo"
    os.makedirs(outdir, exist_ok=True)
    cfgpath = os.path.join(outdir, "run.cfg")
    with open(cfgpath, "w") as f:
        f.write(CFG + f"outspec {outdir}/spec.dat\n"
                      f"outtoomuch {outdir}/toomuch.dat\n"
                      f"outintens {outdir}/intens.dat\n")
    binpath = os.environ.get("TRANSIT_REF_BIN",
                             "/tmp/refbuild/transit/transit")
    subprocess.run([binpath, "-c", cfgpath], cwd=outdir, check=True,
                   capture_output=True)
    spec = np.loadtxt(f"{outdir}/spec.dat")
    intens = np.loadtxt(f"{outdir}/intens.dat")
    toomuch = np.loadtxt(f"{outdir}/toomuch.dat", skiprows=2)
    np.savez_compressed(os.path.join(GOLD, "ref_demo.npz"),
                        wl=spec[:, 0], spec=spec[:, 1], intens=intens,
                        toomuch=toomuch)
    print("golden:", spec.shape, intens.shape)


if __name__ == "__main__":
    main()
