"""Unit pins for the cloud-deck and Rayleigh-scattering extinction models.

Cloud models 2-5 cannot be conformance-tested against the reference
binary: computeextcloud multiplies the *uninitialized* mean_dens stack
array (transit/src/tau.c:129 declares it without zeroing, :203
accumulates into it — undefined behavior).  These tests replicate the C
switch formulas and the top-down layer scan of computeextcloud
(extinction.c:629-693) directly in numpy and pin our vectorized
implementation against them; the well-defined subset (both Rayleigh
flags, cloud model 1) is additionally golden-pinned in
tests/test_conformance.py::TestScatteringClouds.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from transit_tpu.constants import PI, E0H2, RAYEXP, MICRON, NAVOGADRO
from transit_tpu.opacities.clouds import CloudParams, cloud_extinction
from transit_tpu.opacities.scattering import scattering_extinction


@pytest.fixture(scope="module")
def atmo():
    rng = np.random.default_rng(11)
    nl, nwn = 24, 17
    press = np.logspace(1.5, -4, nl)            # bottom-up, descending
    mean_dens = 10.0 ** rng.uniform(-9, -4, nl)
    nH = 10.0 ** rng.uniform(14, 19, nl)
    wns = np.linspace(800.0, 9000.0, nwn)
    return press, mean_dens, nH, wns


def c_reference_cloud(cl, press, mean_dens, nH, wn):
    """Scalar transcription of computeextcloud (extinction.c:629-693)
    for one wavenumber."""
    n = press.shape[0]
    e = np.zeros(n)
    cloudtop, cloudbot = 10.0 ** cl.cloudtop, 10.0 ** cl.cloudbot
    if cl.cloudext == 0.0:
        return e
    x = 2.0 * PI * cl.r * wn
    refwn = cl.refwn ** cl.gamma
    kBP = cl.cloudext * wn ** cl.gamma
    # kFH only enters flag 4; evaluating it for flag 1/2 (where r and Q
    # default to 0) raises divide-by-zero warnings:
    kFH = (cl.cloudext / (cl.Q * x ** (-cl.gamma) + x ** 0.2)
           if cl.flag == 4 else 0.0)
    i = n - 1
    while i >= 0 and press[i] < cloudtop:
        i -= 1
    while i >= 0 and press[i] < cloudbot:
        e[i] = {1: cl.cloudext,
                2: cl.cloudext * mean_dens[i],
                3: kBP * mean_dens[i],
                4: kFH * mean_dens[i],
                5: nH[i] * kBP * cl.sig / refwn * mean_dens[i]}[cl.flag]
        i -= 1
    return e


CASES = [
    CloudParams(flag=1, cloudext=3e-7, cloudtop=-1.0, cloudbot=1.0),
    CloudParams(flag=2, cloudext=2e2, cloudtop=-2.0, cloudbot=1.4),
    CloudParams(flag=3, cloudext=1e-3, cloudtop=-0.5, cloudbot=1.5,
                gamma=-4.0, Q=1.0, r=1.0, sig=1.0, refwn=1.0),
    CloudParams(flag=4, cloudext=5e1, cloudtop=-3.0, cloudbot=0.0,
                gamma=2.0, Q=10.0, r=1e-4, sig=1.0, refwn=1.0),
    CloudParams(flag=5, cloudext=1e-2, cloudtop=-1.5, cloudbot=1.2,
                gamma=-4.0, Q=1.0, r=1.0, sig=1e-27, refwn=1e4),
]


@pytest.mark.parametrize("cl", CASES, ids=[f"flag{c.flag}" for c in CASES])
def test_cloud_models_match_c_formulas(atmo, cl):
    press, mean_dens, nH, wns = atmo
    ours = np.asarray(cloud_extinction(
        cl, jnp.asarray(press), jnp.asarray(mean_dens), jnp.asarray(nH),
        jnp.asarray(wns)))                       # (nwn, nl)
    ref = np.stack([c_reference_cloud(cl, press, mean_dens, nH, w)
                    for w in wns])
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=0)
    # The deck must actually cover an interior band of layers:
    inside = (press >= 10.0 ** cl.cloudtop) & (press < 10.0 ** cl.cloudbot)
    assert 0 < inside.sum() < press.shape[0]
    assert np.all(ours[:, ~inside] == 0.0)
    assert np.all(ours[:, inside] != 0.0)


def test_cloud_zero_ext_is_zero(atmo):
    press, mean_dens, nH, wns = atmo
    out = np.asarray(cloud_extinction(
        CloudParams(flag=3, cloudext=0.0), jnp.asarray(press),
        jnp.asarray(mean_dens), jnp.asarray(nH), jnp.asarray(wns)))
    assert np.all(out == 0.0)


def test_lecavelier_formula(atmo):
    """flag 1: e = 10^logext * E0H2 * p/T * wn^4 with *raw* file-unit
    p/T (extinction.c:604-608, tau.c:113-114)."""
    press, _, _, wns = atmo
    temp = np.linspace(900.0, 1600.0, press.shape[0])
    logext = 0.7
    ours = np.asarray(scattering_extinction(
        1, logext, jnp.asarray(press), jnp.asarray(temp), jnp.asarray(wns)))
    ref = (10.0 ** logext * E0H2 * press[None, :] / temp[None, :] *
           (wns ** RAYEXP)[:, None])
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_polarizability_formula(atmo):
    """flag 2: PSG-handbook polarizability Rayleigh summed over species
    (extinction.c:610-622)."""
    press, _, _, wns = atmo
    nl = press.shape[0]
    temp = np.full(nl, 1200.0)
    mol_mass = np.array([2.01588, 4.0026, 16.0425])
    mol_pol = np.array([0.787, 0.208, 2.448])
    dens = 10.0 ** np.random.default_rng(5).uniform(-9, -5, (3, nl))
    ours = np.asarray(scattering_extinction(
        2, 0.0, jnp.asarray(press), jnp.asarray(temp), jnp.asarray(wns),
        jnp.asarray(dens), jnp.asarray(mol_mass), jnp.asarray(mol_pol)))
    ref = np.zeros((wns.shape[0], nl))
    for i in range(nl):
        for j in range(3):
            ref[:, i] += (PI * 8e-32 / 3.0 * mol_pol[j] ** 2 *
                          (2.0 * PI * wns * MICRON) ** 4 *
                          dens[j, i] / mol_mass[j] * NAVOGADRO)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
