"""Smoke-run every showcase entry point headlessly (VERDICT r2 weak #5).

Each examples/*.py and tutorials/*.py runs in a subprocess with --small
on the CPU backend (forced via jax.config before the script imports jax,
since the ambient TPU plugin ignores JAX_PLATFORMS). Deselected by
default (pytest.ini addopts); run with  `python -m pytest -m smoke`.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = sorted(str(p.relative_to(REPO)) for d in ('examples', 'tutorials')
                 for p in (REPO / d).glob('*.py'))


@pytest.mark.smoke
@pytest.mark.parametrize('script', SCRIPTS)
def test_entry_point_small(script, tmp_path):
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from bhnerf_tpu.utils import compilation_cache_dir\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " compilation_cache_dir())\n"
        "import matplotlib\n"
        "matplotlib.use('Agg')\n"
        "import sys, runpy\n"
        f"sys.argv = [{script!r}, '--small']\n"
        f"runpy.run_path({script!r}, run_name='__main__')\n"
    )
    env = dict(os.environ)
    env['PYTHONPATH'] = str(REPO) + os.pathsep + env.get('PYTHONPATH', '')
    env['MPLBACKEND'] = 'Agg'
    proc = subprocess.run([sys.executable, '-c', code], cwd=str(REPO),
                          env=env, capture_output=True, text=True,
                          timeout=1200)
    assert proc.returncode == 0, (
        f'{script} failed (rc={proc.returncode}):\n'
        f'--- stdout ---\n{proc.stdout[-2000:]}\n'
        f'--- stderr ---\n{proc.stderr[-3000:]}')


@pytest.mark.smoke
def test_production_drive_preempt_resume_rehearsal():
    """CPU rehearsal of the production ALMA drive (DRIVE_CPU shrink):
    leg 1 launches the real fit script and SIGTERMs it mid-run after the
    first periodic checkpoint; leg 2 resumes through the fit script's
    --resume mode (mid-run Optimizer restore, NOT the sweep-level skip)
    and must finish the configured schedule and evaluate chi^2."""
    env = dict(os.environ, DRIVE_CPU='1')
    env['PYTHONPATH'] = str(REPO) + os.pathsep + env.get('PYTHONPATH', '')
    # do NOT inherit the test session's 8-virtual-device XLA_FLAGS: the
    # drive's children would run an 8-way mesh on this 1-core box (~4x
    # the single-device rehearsal) and blow the timeout
    env.pop('XLA_FLAGS', None)
    proc = subprocess.run(
        [sys.executable, str(REPO / 'scripts' / 'drive_alma_production.py'),
         '--num-iters', '400'], cwd=str(REPO), env=env,
        capture_output=True, text=True, timeout=1100)
    assert proc.returncode == 0, (
        f'drive failed (rc={proc.returncode}):\n'
        f'--- stdout ---\n{proc.stdout[-2500:]}\n'
        f'--- stderr ---\n{proc.stderr[-2500:]}')
    assert '"ok": true' in proc.stdout, proc.stdout[-1500:]
