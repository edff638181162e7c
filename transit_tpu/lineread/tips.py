"""Partition-function sources for line-list compilation.

The reference gets HITRAN partition functions from a C TIPS implementation
(Gamache; pylineread/src/pytips — a git submodule that is not vendored in
the tree).  Here partition functions are pluggable:

  * :func:`file_source` — tabulated (T, Q) text files: ExoMol .pf files
    (one isotope, rows "T Q") or multi-isotope transit tables
    (lineread/base.read_pf_file).
  * :func:`polynomial_source` — Irwin (1981) log-polynomial
    (db_voplez.py:120-131).
  * :func:`rigid_rotor_source` — a documented analytic approximation
    Q(T) = Q0 * (T/T0)^p for when no tabulated data is available.  It is
    NOT TIPS-accurate; supply tabulated data for production work.

All sources return (temps, pf[niso, ntemps]) over 70..3000 K by default
(the TIPS range, db_hitran.py:140-142).
"""

from __future__ import annotations

import numpy as np

TIPS_TEMPS = np.arange(70.0, 3000.1, 10.0)


def file_source(paths):
    """One ExoMol-style .pf file per isotope: rows of 'T Q'."""
    def source(iso_names):
        tables = []
        for p in paths:
            d = np.loadtxt(p)
            tables.append(d)
        temps = tables[0][:, 0]
        pf = np.zeros((len(tables), temps.shape[0]))
        for i, d in enumerate(tables):
            if not np.allclose(d[:, 0], temps):
                pf[i] = np.interp(temps, d[:, 0], d[:, 1])
            else:
                pf[i] = d[:, 1]
        return temps, pf
    return source


def transit_pf_source(path, skip_header, isonames_line):
    """Multi-isotope text table in the Kurucz/transit layout."""
    from transit_tpu.lineread.base import read_pf_file

    def source(iso_names):
        names, temps, pf = read_pf_file(path, skip_header, isonames_line)
        return temps, pf
    return source


def polynomial_source(coeffs, temps=None):
    """Irwin (1981) ApJS 45, 621 eq. 2: Q = exp(sum c_k ln(T)^k)."""
    def source(iso_names):
        t = np.arange(1000.0, 7001.0, 50.0) if temps is None else temps
        lnt = np.log(t)
        logq = np.zeros_like(t)
        for k, c in enumerate(coeffs):
            logq += c * lnt ** k
        return t, np.exp(logq)[None, :].repeat(len(iso_names), 0)
    return source


def rigid_rotor_source(q0=100.0, t0=296.0, power=1.5, temps=None):
    """Approximate power-law Q(T) = q0 (T/t0)^power (linear molecules:
    power ~1; nonlinear: ~1.5).  A placeholder when no tabulated data is
    available — documented as approximate."""
    def source(iso_names):
        t = TIPS_TEMPS if temps is None else temps
        pf = q0 * (t / t0) ** power
        return t, pf[None, :].repeat(len(iso_names), 0)
    return source


# Rough power-law defaults by molecule shape (approximation only):
_POWER = {"CO": 1.0, "HCN": 1.0, "CO2": 1.1, "C2H2": 1.2}


def default_source(molecule, iso_names):
    """Fallback approximation used when the compiler isn't given tabulated
    partition functions (the reference would call TIPS here)."""
    p = _POWER.get(molecule, 1.5)
    return rigid_rotor_source(power=p)
