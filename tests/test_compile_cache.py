"""ark_tpu enables JAX's persistent compilation cache by default.

Framework feature, not a bench trick: on remote-compile TPU attaches the
pipeline programs cost 30 s-10 min each to compile, and the cache turns a
fresh-process cohort run from minutes of compiles into seconds (measured:
the pixel-clustering template end-to-end on the TPU attach went
222 s -> 7.7 s). These tests pin the precedence contract of
`ark_tpu._default_compile_cache` via fresh subprocesses (the config is
process-global and sticky)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe(extra_env):
    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env.pop("ARK_TPU_XLA_CACHE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import ark_tpu\n"
        "print(repr(jax.config.jax_compilation_cache_dir))\n"
    )
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout.strip().splitlines()[-1]

def test_default_cache_dir_enabled():
    assert _probe({}) == repr(os.path.join(
        os.path.expanduser("~"), ".cache", "ark_tpu", "xla_cache"))


def test_knob_disables():
    assert _probe({"ARK_TPU_XLA_CACHE": "0"}) == "None"


def test_knob_overrides_path(tmp_path):
    target = str(tmp_path / "my_cache")
    assert _probe({"ARK_TPU_XLA_CACHE": target}) == repr(target)


def test_jax_env_var_wins(tmp_path):
    # jax's own env var configures the cache at jax-config level; ark_tpu
    # must not override it
    target = str(tmp_path / "jax_cache")
    assert _probe({"JAX_COMPILATION_CACHE_DIR": target}) == repr(target)
