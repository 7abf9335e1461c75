"""Packaging hygiene: every documented optional capability is installable.

The reference pins its full dependency list in one place
(``/root/reference/pyproject.toml``); here optional capabilities are
gated imports, so each gated third-party import inside the package must
be resolvable by a core dependency or a declared extra — otherwise a
fresh ``pip install .[...]`` cannot enable a documented feature.
"""

import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "bluerov2_dynamics_tpu"

if sys.version_info >= (3, 11):
    import tomllib
else:  # pragma: no cover
    tomllib = None


@pytest.mark.skipif(tomllib is None, reason="needs tomllib (py3.11+)")
def test_every_gated_import_has_a_declared_dependency():
    proj = tomllib.loads((REPO / "pyproject.toml").read_text())["project"]
    declared = {re.split(r"[<>=!\[ ]", d)[0].lower()
                for d in proj["dependencies"]}
    for extra in proj.get("optional-dependencies", {}).values():
        declared |= {re.split(r"[<>=!\[ ]", d)[0].lower() for d in extra}

    # third-party modules imported lazily (inside functions) anywhere in
    # the package = the gated capabilities; stdlib and self-imports excluded
    gated = set()
    for py in PKG.rglob("*.py"):
        for line in py.read_text().splitlines():
            m = re.match(r"\s+(?:import|from)\s+([a-zA-Z_][a-zA-Z0-9_]*)",
                         line)
            if m:
                gated.add(m.group(1))
    stdlib = {name for name in gated
              if name in sys.stdlib_module_names}
    third_party = gated - stdlib - {"bluerov2_dynamics_tpu", "jax", "jaxlib"}

    dist_name = {"pil": "pillow", "orbax": "orbax-checkpoint",
                 "sklearn": "scikit-learn"}
    missing = {
        mod for mod in third_party
        if dist_name.get(mod.lower(), mod).lower() not in declared
    }
    assert not missing, (
        f"gated imports with no core dep or extra in pyproject.toml: "
        f"{sorted(missing)}")


def test_torch_import_extra_enables_checkpoint_loader():
    """The capability behind the ``torch-import`` extra actually imports
    once torch is present (it is in this image)."""
    pytest.importorskip("torch")
    from bluerov2_dynamics_tpu.models.pinc import load_torch_checkpoint
    assert callable(load_torch_checkpoint)
