"""CI coverage of the driver contract (__graft_entry__) — VERDICT r1 items
1-2: entry() must stay jittable and dryrun_multichip must self-provision its
device platform so it passes even when the caller sees a single (TPU) chip.
"""

import pathlib
import subprocess
import sys

import jax

REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import __graft_entry__  # noqa: E402


def test_entry_is_jittable():
    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)          # abstract trace: shape/dtype only
    assert out.shape == (1, 256, 256, 3)


def test_dryrun_multichip_in_process():
    # conftest provisions 8 virtual CPU devices, so this runs in-process.
    # n=4 also exercises the dp×tp (2, 2) tensor-sharded step (r2).
    __graft_entry__.dryrun_multichip(4)


def test_dryrun_multichip_self_provisions():
    # Driver path: a fresh interpreter with NO forced platform must succeed
    # by re-execing itself with virtual CPU devices. Run from a clean child
    # (jax unimported at call time) exactly as the driver does.
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(2)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
