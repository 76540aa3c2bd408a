"""Parameter-file parsing + unit derivation [G2: begrun.c] tests."""

import math

import pytest

from gadget_leicester_tpu.core.config import (GRAVITY_CGS, TIMEBASE,
                                              parse_parameter_text)

GASSPHERE_PARAM = """
% Example stock-style parameter file (gassphere workload)
InitCondFile        ./gassphere_littleendian.dat
OutputDir           ./out
EnergyFile          energy.txt
InfoFile            info.txt
TimingsFile         timings.txt
CpuFile             cpu.txt
RestartFile         restart
SnapshotFileBase    snapshot
OutputListFilename  output_list.txt

ICFormat            1
SnapFormat          1
ComovingIntegrationOn 0
TypeOfTimestepCriterion 0
OutputListOn        0
PeriodicBoundariesOn 0

TimeBegin           0.0
TimeMax             3.0
Omega0              0
OmegaLambda         0
OmegaBaryon         0
HubbleParam         1.0
BoxSize             0

TimeBetSnapshot     0.5
TimeOfFirstSnapshot 0
CpuTimeBetRestartFile 36000
TimeBetStatistics   0.05

NumFilesPerSnapshot 1
NumFilesWrittenInParallel 1
TimeLimitCPU        36000
ResubmitOn          0
ResubmitCommand     my-scriptfile

ErrTolIntAccuracy   0.025
CourantFac          0.15
MaxSizeTimestep     0.03
MinSizeTimestep     0.0

ErrTolTheta         0.5
TypeOfOpeningCriterion 1
ErrTolForceAcc      0.005
TreeDomainUpdateFrequency 0.1

DesNumNgb           50
MaxNumNgbDeviation  2
ArtBulkViscConst    0.8
InitGasTemp         0
MinGasTemp          0

PartAllocFactor     1.5
TreeAllocFactor     0.8
BufferSize          25

UnitLength_in_cm         3.085678e21
UnitMass_in_g            1.989e43
UnitVelocity_in_cm_per_s 1e5
GravityConstantInternal  0

MinGasHsmlFractional 0.25
SofteningGas       0.05
SofteningHalo      0.1
SofteningDisk      0.1
SofteningBulge     0.1
SofteningStars     0.1
SofteningBndry     0.1
SofteningGasMaxPhys       0.05
SofteningHaloMaxPhys      0.1
SofteningDiskMaxPhys      0.1
SofteningBulgeMaxPhys     0.1
SofteningStarsMaxPhys     0.1
SofteningBndryMaxPhys     0.1
"""


def test_parse_stock_param():
    cfg = parse_parameter_text(GASSPHERE_PARAM)
    assert cfg.init_cond_file == "./gassphere_littleendian.dat"
    assert cfg.time_max == 3.0
    assert cfg.des_num_ngb == 50.0
    assert cfg.softening_gas == 0.05
    assert cfg.ic_format == 1
    assert cfg.comoving_integration_on == 0


def test_derived_units_kpc_1e10msun_kms():
    """Standard GADGET units: G_internal must come out 43007.1
    [G2: set_units(); Springel 2005]."""
    cfg = parse_parameter_text(GASSPHERE_PARAM)
    assert math.isclose(cfg.grav_internal, 43007.1, rel_tol=1e-3)
    assert math.isclose(cfg.hubble_internal, 0.1, rel_tol=1e-4)
    # timeline spacing: physical run -> linear
    assert math.isclose(cfg.timebase_interval, 3.0 / TIMEBASE, rel_tol=1e-12)


def test_missing_required_raises():
    with pytest.raises(ValueError, match="missing required"):
        parse_parameter_text("TimeBegin 0.0\nTimeMax 1.0\n")


def test_unknown_keys_tolerated_unless_strict():
    txt = GASSPHERE_PARAM + "\nSomeForkSpecificKnob  3\n"
    cfg = parse_parameter_text(txt)  # ok
    assert cfg.time_max == 3.0
    with pytest.raises(ValueError, match="unknown"):
        parse_parameter_text(txt, strict=True)


def test_comoving_timebase_is_log_a():
    txt = GASSPHERE_PARAM.replace(
        "ComovingIntegrationOn 0", "ComovingIntegrationOn 1"
    ).replace("TimeBegin           0.0", "TimeBegin           0.1")
    cfg = parse_parameter_text(txt)
    assert math.isclose(
        cfg.timebase_interval, math.log(3.0 / 0.1) / TIMEBASE, rel_tol=1e-12
    )


def test_makefile_options_sidecar_parsing():
    """Makefile-style `-DOPT` lines -> SimOptions overrides [G2: Makefile]."""
    from gadget_leicester_tpu.core.config import parse_makefile_options

    kw = parse_makefile_options("""
# stock Makefile idiom
OPT += -DPERIODIC -DPMGRID=128
OPT += -DOUTPUTPOTENTIAL
FLEXSTEPS          # bare flag form
""")
    assert kw["periodic"] is True
    assert kw["pmgrid"] == 128
    assert kw["gravity_mode"] == "treepm"  # implied by PMGRID
    assert kw["output_potential"] is True
    assert kw["flexsteps"] is True

    with pytest.raises(ValueError, match="NOTAFLAG"):
        parse_makefile_options("OPT += -DNOTAFLAG")


def test_auto_pmgrid_3smooth_and_monotone():
    from gadget_leicester_tpu.core.config import auto_pmgrid

    def is_3smooth(n):
        for p in (2, 3):
            while n % p == 0:
                n //= p
        return n == 1

    last = 0
    for n in (1_000, 64**3, 2 * 64**3, 2 * 128**3, 2 * 256**3):
        g = auto_pmgrid(n)
        assert is_3smooth(g), g
        assert g >= last
        last = g
    # the headline config gets the measured-good 192 mesh
    assert auto_pmgrid(2 * 128**3) == 192


def test_options_from_config_periodic_defaults_to_treepm():
    from gadget_leicester_tpu.core.config import options_from_config

    cfg = parse_parameter_text(
        GASSPHERE_PARAM.replace("PeriodicBoundariesOn 0",
                                "PeriodicBoundariesOn 1")
        .replace("BoxSize             0", "BoxSize             1000"))
    opts = options_from_config(cfg, n_particles=2 * 64**3)
    assert opts.periodic and opts.gravity_mode == "treepm" and opts.pmgrid > 0
    # vacuum config stays on the auto (tree/direct) path
    opts2 = options_from_config(parse_parameter_text(GASSPHERE_PARAM),
                                n_particles=500)
    assert not opts2.periodic and opts2.pmgrid == 0
