"""Multi-molecule hot-Jupiter workload (BASELINE workload 3).

H2O + CO + CO2 + CH4 over 500-10000 cm^-1 (1-20 um), 100 layers,
10 bar -> 1e-8 bar, with H2-H2 and H2-He CIA.  Synthetic but
band-structured line lists (clusters around the molecules' real band
centers) so the line density per wavenumber tile is realistically
non-uniform — the load-balance case SURVEY §7 calls out.

Files are written transit-format so the identical workload drives the
reference C binary (hj_ref.cfg) for baselines.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data", "hj")

NL = 100
WN_LO, WN_HI = 500.0, 10000.0
WN_DELT = 0.5

# (molecule, id, mass, diam, pol, nlines_frac, band centers (wn, width))
MOLS = [
    ("H2O", 101, 18.01528, 3.2, 1.501, 0.50,
     [(1600.0, 500.0), (3750.0, 400.0), (5300.0, 350.0), (7200.0, 300.0),
      (900.0, 700.0)]),
    ("CO", 103, 28.0101, 2.8, 1.953, 0.10,
     [(2143.0, 120.0), (4260.0, 90.0)]),
    ("CO2", 104, 44.0095, 2.8, 2.507, 0.20,
     [(667.0, 120.0), (2349.0, 150.0), (3715.0, 120.0), (4978.0, 100.0),
      (6348.0, 90.0)]),
    ("CH4", 102, 16.0425, 4.0, 2.448, 0.20,
     [(1306.0, 250.0), (3019.0, 300.0), (4300.0, 250.0), (6000.0, 250.0)]),
]
Q_ABS = {"H2O": 4e-4, "CO": 3e-4, "CO2": 1e-7, "CH4": 1e-6}
PF = {"H2O": (175.0, 1.5), "CO": (110.0, 1.0),
      "CO2": (290.0, 1.3), "CH4": (600.0, 1.6)}


def _band_lines(rng, centers, n):
    """Wavenumbers clustered around band centers + a 15% uniform floor."""
    nuni = int(0.15 * n)
    parts = [rng.uniform(WN_LO, WN_HI, nuni)]
    per = (n - nuni) // len(centers)
    for c, w in centers:
        wn = rng.normal(c, w, per)
        parts.append(wn)
    wn = np.concatenate(parts)[:n]
    return np.clip(wn, WN_LO - 20.0, WN_HI + 20.0)


DATA_WIDE = os.path.join(HERE, "data", "hj_wide")


def make_wide():
    """BASELINE scale target: ~10^6 output wavenumbers (dnu = 0.01 over
    1-20 um) x 100 layers, 10^6 lines.  The C reference needs a reduced
    oversampling (2160x would be a 16 GB fine grid)."""
    return make(data_dir=DATA_WIDE, nlines=1_000_000, wndelt=0.01,
                wnosamp=216)


def make(data_dir=DATA, nlines=200_000, wndelt=WN_DELT, wnosamp=2160):
    os.makedirs(data_dir, exist_ok=True)
    import sys
    sys.path.insert(0, os.path.dirname(HERE))
    from transit_tpu.io.tli import (TliData, TliDatabase, TliIsotope,
                                    write_tli, sort_lines)
    rng = np.random.default_rng(2024)

    with open(os.path.join(data_dir, "molecules.dat"), "w") as f:
        f.write("# ID  name  mass  diameter src pol\n"
                "   2    He         4.0026020   2.0       01    0.208\n"
                " 105    H2         2.01588     2.89      02    0.787\n")
        for name, mid, mass, diam, pol, _, _ in MOLS:
            f.write(f" {mid:3d}    {name:<6s}   {mass:<12g} {diam:<8g}"
                    f"  01    {pol}\n")

    press = np.logspace(1, -8, NL)      # bar, bottom-up
    temp = 1400.0 + 250.0 * np.tanh(0.6 * np.log10(press))
    radius = 71000.0 + np.cumsum(np.full(NL, 230.0))   # km
    qabs = {m: np.full(NL, Q_ABS[m]) for m, *_ in MOLS}
    qhe = np.full(NL, 0.145)
    qh2 = 1.0 - qhe - sum(qabs.values())
    species = ["He", "H2"] + [m for m, *_ in MOLS]
    with open(os.path.join(data_dir, "hj.atm"), "w") as f:
        f.write("# hot-Jupiter benchmark atmosphere\nur 1e5\nup 1e6\n"
                "q number\n\n#SPECIES\n" + " ".join(species) +
                "\n\n#TEADATA\n")
        for i in range(NL):
            cols = [qhe[i], qh2[i]] + [qabs[m][i] for m, *_ in MOLS]
            f.write(f" {radius[i]:.3f} {press[i]:.6e} {temp[i]:.2f} " +
                    " ".join(f"{v:.8e}" for v in cols) + "\n")

    # CIA (H2-H2 and H2-He), smooth synthetic shapes:
    wn = np.arange(WN_LO - 50.0, WN_HI + 51.0, 25.0)
    temps = np.array([400., 700., 1100., 1600., 2200., 3000.])
    for pair, amp, cen, wid in (("H2 H2", 6e-8, 2400.0, 2000.0),
                                ("H2 He", 2e-8, 5000.0, 3000.0)):
        fn = os.path.join(data_dir,
                          f"cia_{pair.replace(' ', '_')}.dat")
        with open(fn, "w") as f:
            f.write(f"# synthetic CIA\ni {pair}\nt " +
                    " ".join(f"{t:.0f}" for t in temps) + "\n\n")
            for w in wn:
                vals = (amp * np.sqrt(temps / 1000.0) *
                        (np.exp(-((w - cen) / wid) ** 2) + 0.05))
                f.write(f" {w:9.2f}  " +
                        " ".join(f"{v:.6e}" for v in vals) + "\n")

    # TLI: one database per molecule:
    t_pf = np.arange(70.0, 3020.0, 50.0)
    dbs, all_wl, all_iso, all_elow, all_gf = [], [], [], [], []
    for k, (name, mid, mass, _, _, frac, centers) in enumerate(MOLS):
        a, b = PF[name]
        z = a * (t_pf / 296.0) ** b
        dbs.append(TliDatabase(f"synth-{name.lower()}", name, t_pf,
                               [TliIsotope(f"{name}-1", mass, 1.0, z)]))
        n = int(frac * nlines)
        wn_m = _band_lines(rng, centers, n)
        all_wl.append(1e4 / wn_m)
        all_iso.append(np.full(n, k, np.int16))
        all_elow.append(rng.uniform(0.0, 8000.0, n))
        all_gf.append(10.0 ** rng.uniform(-9.0, -2.0, n))
    wl = np.concatenate(all_wl)
    isoid = np.concatenate(all_iso)
    elow = np.concatenate(all_elow)
    gf = np.concatenate(all_gf)
    wl, isoid, elow, gf, isotran = sort_lines(wl, isoid, elow, gf)
    write_tli(os.path.join(data_dir, "hj.tli"),
              TliData(version=6, iwav=float(wl.min()), fwav=float(wl.max()),
                      databases=dbs, wl=wl, isoid=isoid, elow=elow, gf=gf,
                      isotran=isotran))

    # Reference-binary config on the identical files:
    with open(os.path.join(data_dir, "hj_ref.cfg"), "w") as f:
        f.write(f"""atm     {data_dir}/hj.atm
linedb  {data_dir}/hj.tli
csfile  {data_dir}/cia_H2_H2.dat,{data_dir}/cia_H2_He.dat
molfile {data_dir}/molecules.dat
wnlow   {WN_LO:.0f}
wnhigh  {WN_HI:.0f}
wndelt  {wndelt}
wnosamp {wnosamp}
wnfct   1.0
nwidth  20
ethresh 1e-8
toomuch 1e30
solution eclipse
verb    1
outspec {data_dir}/hj_ref_spectrum.dat
""")
    return data_dir


if __name__ == "__main__":
    make()
    print("hot-Jupiter workload written to", DATA)
