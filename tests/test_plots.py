"""Smoke tests for the result-reporting surface (reference solver.py:173-253
and scenario_tree.py:217-240): residual plot, trajectory fan plot, pgfplots
export, bulls-eye tree plot, and the print helpers."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from raocp_tpu.models import demo_problem
from raocp_tpu.solver import Solver


@pytest.fixture(scope="module")
def solved(tmp_path_factory):
    problem, x0 = demo_problem()
    solver = Solver(problem)
    solver.solve(x0, max_iters=50, tol=1e-3)
    return problem, solver


def test_plot_residuals_writes_file(solved, tmp_path):
    _, solver = solved
    out = tmp_path / "residuals.png"
    solver.plot_residuals(filename=str(out), show=False)
    assert out.exists() and out.stat().st_size > 0


def test_plot_solution_writes_file(solved, tmp_path):
    problem, solver = solved
    out = tmp_path / "solution.png"
    solver.plot_solution(filename=str(out), show=False)
    assert out.exists() and out.stat().st_size > 0


def test_pgfplots_export(solved, tmp_path):
    """The reference commits its residual curves as a pgfplots .tex
    (4-3-residuals.tex); save_residuals_tex produces the same artifact."""
    from raocp_tpu.utils.plots import save_residuals_tex

    _, solver = solved
    out = tmp_path / "residuals.tex"
    save_residuals_tex(solver.result, str(out))
    text = out.read_text()
    assert "axis" in text and "addplot" in text


def test_pgfplots_solution_export(solved, tmp_path):
    """The reference also commits its trajectory fans as a pgfplots .tex
    ('python-solution.tex', reference solver.py:253); save_solution_tex
    produces the same artifact — one group plot per element, one scenario
    polyline per leaf."""
    from raocp_tpu.utils.plots import save_solution_tex

    problem, solver = solved
    out = tmp_path / "solution.tex"
    save_solution_tex(problem.tree, solver.result, str(out))
    text = out.read_text()
    assert "groupplot" in text and "addplot" in text
    # one state fan per element + one control fan per element, each with
    # one polyline per leaf scenario
    tree = problem.tree
    num_leaves = tree.num_leaf_nodes
    n = solver.result.primal.x.shape[1]
    m = solver.result.primal.u.shape[1]
    assert text.count("\\addplot") == (n + m) * num_leaves


def test_bulls_eye_plot(solved, tmp_path):
    problem, _ = solved
    out = tmp_path / "tree.png"
    problem.tree.bulls_eye_plot(filename=str(out), show=False)
    assert out.exists() and out.stat().st_size > 0


def test_print_helpers(solved, capsys):
    _, solver = solved
    solver.print_states()
    solver.print_inputs()
    captured = capsys.readouterr().out
    assert "states" in captured and "inputs" in captured
