"""Golden-image regression (VERDICT r1 item 8): byte-exact renders of the
canonical demo scene and every BASELINE config, for both the core renderer
and the Pallas kernel (interpret mode), against goldens committed by
scripts/make_goldens.py.  Any kernel or semantics change that shifts a
single pixel fails here — regenerate goldens only with an intentional,
documented semantics change."""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

NAMES = ["reference_demo", "single_sphere", "three_spheres_ground",
         "full_reflective", "fit_target", "procedural_spheres"]


@pytest.mark.parametrize("name", NAMES)
def test_golden_byte_exact(name):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import make_goldens

    core_path = os.path.join(GOLDEN_DIR, f"{name}_core.npy")
    pallas_path = os.path.join(GOLDEN_DIR, f"{name}_pallas.npy")
    if not (os.path.exists(core_path) and os.path.exists(pallas_path)):
        pytest.fail(f"goldens missing for {name}; run scripts/make_goldens.py")

    core, pallas = make_goldens.render(name)
    np.testing.assert_array_equal(
        core, np.load(core_path),
        err_msg=f"{name}: core render shifted vs committed golden")
    np.testing.assert_array_equal(
        pallas, np.load(pallas_path),
        err_msg=f"{name}: pallas render shifted vs committed golden")
