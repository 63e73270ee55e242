"""Pre/post-processing tools (reference tools/ parity)."""

import os
import subprocess
import sys
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from dedflow_tpu.io.h5 import write_mesh_h5, write_solution_h5
from dedflow_tpu.mesh.gen import box_mesh

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sol2vtk_writes_valid_xdmf(tmp_path):
    mesh = box_mesh(3, 3, 3)
    write_mesh_h5(str(tmp_path / "mesh.h5"), mesh)
    n = mesh.num_node
    for step in (0, 10):
        write_solution_h5(
            str(tmp_path / f"sol.{step}.h5"),
            np.random.default_rng(step).normal(size=(n, 6)),
            np.zeros((n, 6)),
            step=step,
            time=step * 0.05,
        )
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "sol2vtk.py"),
         str(tmp_path / "mesh.h5"), str(tmp_path)],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    tree = ET.parse(tmp_path / "solution.xdmf")
    grids = tree.findall(".//Grid[@GridType='Uniform']")
    assert len(grids) == 2
    times = [float(g.find("Time").get("Value")) for g in grids]
    assert times == [0.0, 0.5]
    attrs = tree.findall(".//Attribute")
    assert {a.get("Name") for a in attrs} == {"u", "p", "phi", "T"}


def test_mesh_convert_requires_meshio_gracefully(tmp_path):
    """Without meshio in the image, the converter exits with a clear
    message instead of a traceback."""
    src = tmp_path / "dummy.msh"
    src.write_text("$MeshFormat\n")
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "mesh_convert.py"),
         str(src), str(tmp_path / "out.h5")],
        capture_output=True, text=True,
    )
    try:
        import meshio  # noqa: F401

        has_meshio = True
    except ImportError:
        has_meshio = False
    if not has_meshio:
        assert out.returncode != 0
        assert "meshio is required" in (out.stderr + out.stdout)


def test_config_roundtrip_includes_round2_fields(tmp_path):
    """save_config/load_config preserve the round-2 solver options
    (SIMPLE PC settings, lattice gating/backends)."""
    from dedflow_tpu.config import KrylovConfig, SolverConfig, load_config, save_config

    cfg = SolverConfig(
        krylov=KrylovConfig(pc="simple", pc_schur_sweeps=4, pc_schur_omega=0.7),
        use_lattice="on",
        lattice_backend="xla",
        scatter_method="grouped",
    )
    p = str(tmp_path / "cfg.json")
    save_config(cfg, p)
    back = load_config(p)
    assert back.krylov.pc == "simple"
    assert back.krylov.pc_schur_sweeps == 4
    assert back.krylov.pc_schur_omega == 0.7
    assert back.use_lattice == "on"
    assert back.lattice_backend == "xla"
    assert back.scatter_method == "grouped"
