"""Configuration, compatible with reference .cfg files.

The reference merges CLI flags and parameter files through procopt
(pu/src/procopt.c); option names and defaults here match the option table in
transit/src/argum.c:112-320 so reference config files drive this framework
unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class TransitConfig:
    # Input/output files (argum.c:133-155):
    atm: Optional[str] = None
    linedb: Optional[str] = None
    csfile: Optional[str] = None          # comma-separated list
    molfile: str = "../inputs/molecules.dat"
    outspec: str = "outspectrum"
    outtoomuch: Optional[str] = None
    outsample: Optional[str] = None
    outintens: Optional[str] = None
    savefiles: bool = False

    # Radius options (argum.c:159-171):
    raddelt: float = -1.0                 # -1: keep atmosphere sampling
    radlow: float = 0.0
    radhigh: float = 0.0
    radfct: float = 0.0

    # Atmosphere options (argum.c:174-188):
    allowq: float = 1e-5
    refpress: Optional[float] = None
    refradius: Optional[float] = None
    gsurf: Optional[float] = None
    qmol: Optional[str] = None
    qscale: Optional[str] = None

    # Wavelength (argum.c:191-200):
    wllow: float = 0.0
    wlhigh: float = 0.0
    wlfct: float = 1e-4

    # Wavenumber (argum.c:203-218):
    wnlow: float = 0.0
    wnhigh: float = 0.0
    wndelt: float = 0.0
    wnosamp: int = 2160
    wnfct: float = 0.0

    # Voigt profiles (argum.c:221-235):
    ndop: int = 60
    nlor: int = 60
    dmin: float = 1e-3
    dmax: float = 0.25
    lmin: float = 1e-4
    lmax: float = 10.0
    nwidth: float = 20.0

    # Extinction (argum.c:238-267):
    ethreshold: float = 1e-8
    cloud: Optional[str] = None           # "flag,ext,top,bot[,...]"
    cloudtop: Optional[float] = None
    scattering: Optional[str] = None
    detailext: Optional[str] = None       # "filename:wn1,wn2,..."
    detailcia: Optional[str] = None
    detailtau: Optional[str] = None

    # Opacity grid (argum.c:270-284):
    saveext: Optional[str] = None
    opacityfile: Optional[str] = None
    tlow: float = 500.0
    thigh: float = 3000.0
    tempdelt: float = 100.0
    justOpacity: bool = False
    shareOpacity: bool = False

    # Ray solution (argum.c:287-303):
    solution: str = "eclipse"
    toomuch: float = 20.0
    taulevel: int = 1
    modlevel: int = 1

    # Geometry (argum.c:306-318):
    starrad: float = 1.125                # solar radii
    transparent: bool = False
    raygrid: str = "0 20 40 60 80"
    # Orbital parameters "smaxis,time,incl,ecc,long_node,arg_per" and
    # their unit factors (argum.c:307-314; defaults AU, hours, deg, 1,
    # deg, deg — geometry.c:26-31).  Only starrad affects the spectrum;
    # these feed rt/orbit.py's planet-position solution:
    gorbpar: Optional[str] = None
    gorbparfct: Optional[str] = None

    verb: int = 2

    def raygrid_list(self):
        return [float(a) for a in self.raygrid.split()]

    def orbit_params(self):
        """(smaxis, time, incl, ecc, long_node, arg_per) with unit factors
        applied per gorbparfct (geometry.c:26-44)."""
        from transit_tpu.constants import AU, DEGREES, HOUR
        vals = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        if self.gorbpar:
            for i, v in enumerate(self.gorbpar.split(",")):
                vals[i] = float(v)
        fcts = [AU, HOUR, DEGREES, 1.0, DEGREES, DEGREES]
        if self.gorbparfct:
            for i, v in enumerate(self.gorbparfct.split(",")):
                if float(v) > 0:
                    fcts[i] = float(v)
        return vals, fcts


_BOOL_FLAGS = {"justOpacity", "shareOpacity", "transparent", "savefiles"}
_INT_FIELDS = {"wnosamp", "ndop", "nlor", "taulevel", "modlevel", "verb"}
_STR_FIELDS = {"atm", "linedb", "csfile", "molfile", "outspec", "outtoomuch",
               "outsample", "outintens", "qmol", "qscale", "solution",
               "raygrid", "opacityfile", "cloud", "scattering", "saveext",
               "detailext", "detailcia", "detailtau", "gorbpar",
               "gorbparfct"}
_ALIASES = {"ethresh": "ethreshold"}


def load_config(path: str, **overrides) -> TransitConfig:
    """Parse a reference-style config file: 'name value' lines, '#'/';'
    comments (procopt.c getopt_long_files)."""
    cfg = TransitConfig()
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s[0] in "#;":
                continue
            parts = s.split(None, 1)
            name = _ALIASES.get(parts[0], parts[0])
            if not hasattr(cfg, name):
                raise ValueError(f"{path}: unknown option {parts[0]!r}")
            if name in _BOOL_FLAGS:
                setattr(cfg, name, True)
                continue
            val = parts[1].split("#")[0].strip() if len(parts) > 1 else ""
            if name in _STR_FIELDS:
                setattr(cfg, name, val)
            elif name in _INT_FIELDS:
                setattr(cfg, name, int(val))
            else:
                setattr(cfg, name, float(val))
    for k, v in overrides.items():
        setattr(cfg, _ALIASES.get(k, k), v)
    return cfg
