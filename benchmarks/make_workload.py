"""Generate the standard benchmark workload (deterministic, in-repo).

100-layer hot-Jupiter-like atmosphere, 20k-line synthetic CH4-like band,
2000 coarse wavenumbers over 500 cm-1 — the shape class of the BASELINE
extinction+tau metric.  Writes the files transit-format so the identical
workload drives both this framework and the reference C binary.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")

NL = 100
NLINES = 20000
WN_LO, WN_HI, WN_DELT = 2000.0, 2500.0, 0.25
WNOSAMP = 216


def make(data_dir=DATA):
    os.makedirs(data_dir, exist_ok=True)
    import sys
    sys.path.insert(0, os.path.dirname(HERE))
    from transit_tpu.io.tli import (TliData, TliDatabase, TliIsotope,
                                    write_tli, sort_lines)

    rng = np.random.default_rng(123)

    # molecules.dat:
    with open(os.path.join(data_dir, "molecules.dat"), "w") as f:
        f.write("# ID  name  mass  diameter src pol\n"
                "   2    He         4.0026020   2.0       01    0.208\n"
                " 105    H2         2.01588     2.89      02    0.787\n"
                " 102    CH4       16.0425      4.0       01    2.448\n")

    # atmosphere:
    press = np.logspace(0.5, -6, NL)     # ~3 bar to 1e-6 bar
    temp = 1600.0 + 200.0 * np.tanh(np.log10(press))
    radius = 90000.0 + np.cumsum(np.full(NL, 110.0))
    qch4 = np.full(NL, 5e-4)
    qhe = np.full(NL, 0.15)
    qh2 = 1.0 - qhe - qch4
    with open(os.path.join(data_dir, "bench.atm"), "w") as f:
        f.write("# benchmark atmosphere\nur 1e5\nup 1e6\nq number\n\n"
                "#SPECIES\nHe H2 CH4\n\n#TEADATA\n")
        for i in range(NL):
            f.write(f" {radius[i]:.3f} {press[i]:.6e} {temp[i]:.2f} "
                    f"{qhe[i]:.8e} {qh2[i]:.8e} {qch4[i]:.8e}\n")

    # CIA:
    wn = np.arange(1900.0, 2601.0, 20.0)
    temps = np.array([400., 700., 1100., 1600., 2200., 3000.])
    with open(os.path.join(data_dir, "bench_cia.dat"), "w") as f:
        f.write("# bench CIA\ni H2 H2\nt " +
                " ".join(f"{t:.0f}" for t in temps) + "\n\n")
        for w in wn:
            vals = 5e-8 * np.sqrt(temps / 1000.0) * \
                np.exp(-((w - 2250.0) / 500.0) ** 2)
            f.write(f" {w:9.2f}  " +
                    " ".join(f"{v:.6e}" for v in vals) + "\n")

    # H2-He CIA (for the transmission workload: CH4 + H2-H2/H2-He CIA):
    with open(os.path.join(data_dir, "bench_cia_H2He.dat"), "w") as f:
        f.write("# bench CIA H2-He\ni H2 He\nt " +
                " ".join(f"{t:.0f}" for t in temps) + "\n\n")
        for w in wn:
            vals = 2e-8 * np.sqrt(temps / 1000.0) * \
                (np.exp(-((w - 2100.0) / 600.0) ** 2) + 0.05)
            f.write(f" {w:9.2f}  " +
                    " ".join(f"{v:.6e}" for v in vals) + "\n")

    # line list:
    t_pf = np.arange(70.0, 3020.0, 50.0)
    z = 120.0 * (t_pf / 296.0) ** 1.5
    wn_lines = rng.uniform(WN_LO - 10, WN_HI + 10, NLINES)
    gf = 10.0 ** rng.uniform(-8, -2, NLINES)
    elow = rng.uniform(0.0, 4000.0, NLINES)
    wl = 1e4 / wn_lines
    isoid = np.zeros(NLINES, np.int16)
    wl, isoid, elow, gf, isotran = sort_lines(wl, isoid, elow, gf)
    db = TliDatabase("bench-ch4", "CH4", t_pf,
                     [TliIsotope("CH4-1", 16.0425, 1.0, z)])
    write_tli(os.path.join(data_dir, "bench.tli"),
              TliData(version=6, iwav=float(wl.min()), fwav=float(wl.max()),
                      databases=[db], wl=wl, isoid=isoid, elow=elow, gf=gf,
                      isotran=isotran))
    return data_dir


if __name__ == "__main__":
    make()
    print("workload written to", DATA)
