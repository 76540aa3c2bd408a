"""Drift/kick factor tests vs analytic Einstein-de-Sitter results
(SURVEY.md §7 step 1: factor tables vs analytic EdS)."""

import math

import numpy as np
import pytest

from gadget_leicester_tpu.core import cosmology
from gadget_leicester_tpu.core.config import TIMEBASE, parse_parameter_text
from tests.test_config import GASSPHERE_PARAM


def _eds_cfg():
    txt = (GASSPHERE_PARAM
           .replace("ComovingIntegrationOn 0", "ComovingIntegrationOn 1")
           .replace("TimeBegin           0.0", "TimeBegin           0.0625")
           .replace("TimeMax             3.0", "TimeMax             1.0")
           .replace("Omega0              0", "Omega0              1.0"))
    return parse_parameter_text(txt)


def test_drift_factor_eds_analytic():
    """EdS: H = H0 a^-3/2; int_{a0}^{a1} da/(a^3 H) = (2/H0)(a0^-1/2 - a1^-1/2)...

    int da a^{-3/2}/H0 * a^{-... : da/(a^3 H) = da a^{-3/2}/H0 /a^{3/2}
    = da a^{-3}/H0? No: 1/(a^3 * H0 a^{-3/2}) = a^{-3/2}/H0.
    => integral = (2/H0)(a0^{-1/2} - a1^{-1/2}).
    """
    cfg = _eds_cfg()
    h0 = cfg.hubble_internal
    a0, a1 = 0.25, 0.81
    ti0 = round(math.log(a0 / cfg.time_begin) / cfg.timebase_interval)
    ti1 = round(math.log(a1 / cfg.time_begin) / cfg.timebase_interval)
    # recover the exact a values the ticks represent
    a0x = cfg.time_begin * math.exp(ti0 * cfg.timebase_interval)
    a1x = cfg.time_begin * math.exp(ti1 * cfg.timebase_interval)
    expected = 2.0 / h0 * (a0x**-0.5 - a1x**-0.5)
    got = float(cosmology.drift_factor(None, cfg, ti0, ti1))
    assert got == pytest.approx(expected, rel=1e-5)


def test_gravkick_factor_eds_analytic():
    """EdS: int da/(a^2 H) = int da a^{-1/2}/H0 = (2/H0)(a1^1/2 - a0^1/2)."""
    cfg = _eds_cfg()
    h0 = cfg.hubble_internal
    ti0, ti1 = 1000, TIMEBASE // 3
    a0 = cfg.time_begin * math.exp(ti0 * cfg.timebase_interval)
    a1 = cfg.time_begin * math.exp(ti1 * cfg.timebase_interval)
    expected = 2.0 / h0 * (a1**0.5 - a0**0.5)
    got = float(cosmology.gravkick_factor(None, cfg, ti0, ti1))
    assert got == pytest.approx(expected, rel=1e-5)


def test_small_interval_no_cancellation():
    """The f32 killer case: a single smallest-step interval must come out
    with full relative accuracy (the reason tables were replaced by direct
    quadrature — SURVEY.md §7 hard part 4)."""
    cfg = _eds_cfg()
    ti0 = TIMEBASE // 2
    ti1 = ti0 + 256  # tiny step
    a0 = cfg.time_begin * math.exp(ti0 * cfg.timebase_interval)
    a1 = cfg.time_begin * math.exp(ti1 * cfg.timebase_interval)
    h0 = cfg.hubble_internal
    expected = 2.0 / h0 * (a0**-0.5 - a1**-0.5)
    got = float(cosmology.drift_factor(None, cfg, ti0, ti1))
    assert got == pytest.approx(expected, rel=1e-3)
    assert got > 0


def test_physical_factors_are_dt():
    cfg = parse_parameter_text(GASSPHERE_PARAM)
    ti0, ti1 = 1000, 5000
    dt = (ti1 - ti0) * cfg.timebase_interval
    assert float(cosmology.drift_factor(None, cfg, ti0, ti1)) == pytest.approx(dt, rel=1e-6)
    assert float(cosmology.gravkick_factor(None, cfg, ti0, ti1)) == pytest.approx(dt, rel=1e-6)


def test_vectorised_per_particle_intervals():
    cfg = _eds_cfg()
    ti0 = np.array([0, 1000, 50000, 1 << 20])
    ti1 = ti0 + np.array([256, 512, 1024, 2048])
    out = np.asarray(cosmology.gravkick_factor(None, cfg, ti0, ti1))
    assert out.shape == (4,)
    assert np.all(out > 0)
