"""PIP kernel: even-odd vs half-plane oracle, holes, all_touched."""

import numpy as np

from georasters_spark.functions import geometry as geom
from georasters_spark.sources import synth


def _halfplane(z, px, py):
    ring = z.outer
    hp = np.ones(len(px), bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        hp &= ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) > 0
    return hp


def test_convex_matches_halfplane():
    rng = np.random.default_rng(3)
    px = rng.uniform(-180, 180, 50000)
    py = rng.uniform(-90, 90, 50000)
    for z in synth.ZONES_T1:
        assert np.array_equal(geom.points_in_rings(px, py, z.rings), _halfplane(z, px, py)), z.name


def test_concave_zone():
    z = [zz for zz in synth.ZONES_EXTRA if zz.name == "concave_l"][0]
    # in the notch (not inside), in each arm (inside)
    px = np.array([-100.0, -100.0, -140.0])
    py = np.array([-40.0, -60.0, -40.0])
    assert geom.points_in_rings(px, py, z.rings).tolist() == [False, True, True]


def test_donut_hole():
    z = [zz for zz in synth.ZONES_EXTRA if zz.name == "donut"][0]
    px = np.array([55.0, 35.0, 100.0])
    py = np.array([-50.0, -65.0, -50.0])
    assert geom.points_in_rings(px, py, z.rings).tolist() == [False, True, False]


def test_all_touched_superset_of_center():
    """rasterstats all_touched=True selects every cell the center rule
    selects, plus boundary cells (georasters.py:884-886)."""
    spec = synth.T1
    rows, cols = np.meshgrid(np.arange(spec.height), np.arange(spec.width), indexing="ij")
    xc = spec.x0 + (cols.ravel() + 0.5) * spec.cellx
    yc = spec.y0 + (rows.ravel() + 0.5) * spec.celly
    for z in synth.ZONES_T1:
        center = geom.points_in_rings(xc, yc, z.rings)
        touched = geom.cells_touched(xc, yc, spec.cellx, spec.celly, z.rings)
        assert not (center & ~touched).any(), z.name
        assert touched.sum() > center.sum(), z.name  # boundary cells exist


def test_all_touched_sliver():
    """A polygon smaller than one cell must still touch >=1 cell."""
    sliver = synth.make_zone(99, "sliver", [(10.01, 10.01), (10.02, 10.01), (10.02, 10.02)])
    spec = synth.T1
    rows, cols = np.meshgrid(np.arange(spec.height), np.arange(spec.width), indexing="ij")
    xc = spec.x0 + (cols.ravel() + 0.5) * spec.cellx
    yc = spec.y0 + (rows.ravel() + 0.5) * spec.celly
    center = geom.points_in_rings(xc, yc, sliver.rings)
    touched = geom.cells_touched(xc, yc, spec.cellx, spec.celly, sliver.rings)
    assert center.sum() == 0
    assert touched.sum() >= 1
