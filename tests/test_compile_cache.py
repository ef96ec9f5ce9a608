"""ark_tpu enables JAX's persistent compilation cache by default.

Framework feature, not a bench trick: on remote-compile TPU attaches the
pipeline programs cost 30 s-10 min each to compile, and the cache turns a
fresh-process cohort run from minutes of compiles into seconds (measured:
the pixel-clustering template end-to-end on the TPU attach went
222 s -> 7.7 s). These tests pin the precedence contract of
`ark_tpu._default_compile_cache` via fresh subprocesses (the config is
process-global and sticky). HOME is pointed at tmp_path so the suite never
writes ~/.cache on the dev machine and passes on read-only-HOME CI."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# jax first (the sitecustomize situation), then ark_tpu configures it
_JAX_FIRST = (
    "import jax; jax.config.update('jax_platforms', 'cpu')\n"
    "import ark_tpu\n"
    "print(repr(jax.config.jax_compilation_cache_dir))\n"
)
# ark_tpu first: must NOT import jax (users set JAX_PLATFORMS after it);
# the default arrives via jax's own env var at the later jax import. Runs
# under `python -S` because this machine's sitecustomize imports jax at
# interpreter startup — -S simulates a vanilla deployment (site-packages
# is re-added by hand, without executing sitecustomize).
_SITE = __import__("sysconfig").get_paths()["purelib"]
_ARK_FIRST = (
    "import sys\n"
    f"sys.path.append({_SITE!r})  # venv site-packages (no site processing)\n"
    "import ark_tpu\n"
    "assert 'jax' not in sys.modules, 'import ark_tpu must not import jax'\n"
    "import jax\n"
    "print(repr(jax.config.jax_compilation_cache_dir))\n"
)


def _probe(extra_env, tmp_path, code=_JAX_FIRST, no_site=False):
    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env.pop("ARK_TPU_XLA_CACHE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["HOME"] = str(tmp_path)  # hermetic: never touch the real ~/.cache
    env.update(extra_env)
    argv = [sys.executable] + (["-S"] if no_site else []) + ["-c", code]
    res = subprocess.run(argv, env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout.strip().splitlines()[-1]


def _default_dir(tmp_path):
    return repr(os.path.join(str(tmp_path), ".cache", "ark_tpu",
                             "xla_cache"))


def test_default_cache_dir_enabled(tmp_path):
    assert _probe({}, tmp_path) == _default_dir(tmp_path)


def test_ark_first_defers_jax_and_still_caches(tmp_path):
    # ark_tpu imported before jax: no eager jax import, env-var seeding
    assert _probe({}, tmp_path, code=_ARK_FIRST,
                  no_site=True) == _default_dir(tmp_path)


def test_knob_disables(tmp_path):
    for off in ("0", "false", "OFF", "no", ""):
        assert _probe({"ARK_TPU_XLA_CACHE": off}, tmp_path) == "None", off


def test_knob_overrides_path(tmp_path):
    target = str(tmp_path / "my_cache")
    assert _probe({"ARK_TPU_XLA_CACHE": target}, tmp_path) == repr(target)


def test_jax_env_var_wins(tmp_path):
    # jax's own env var configures the cache at jax-config level; ark_tpu
    # must not override it
    target = str(tmp_path / "jax_cache")
    assert _probe({"JAX_COMPILATION_CACHE_DIR": target},
                  tmp_path) == repr(target)
