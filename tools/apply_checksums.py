"""Apply chip-emitted checksum references to .perf recipe files.

``tools/chip_session.sh`` step 8 runs ``python -m dbcsr_tpu.perf <f>
--emit-checksum`` per unpinned recipe; the emitted reference lines land
in ``/tmp/chip_r3/perf_<name>.log``. This tool patches each recipe's
``# checksum`` block (``F`` → ``T`` + threshold + reference) from those
logs, turning a finished chip window into a one-command repo update.
Reference analog: the ``checksum_ref`` lines in the reference's
``tests/inputs/*.perf`` (``tests/dbcsr_performance_multiply.F:102``).

Usage: python tools/apply_checksums.py [logdir] [--dry-run]
"""
import _bootstrap  # noqa: F401  (repo-root sys.path + JAX_PLATFORMS honor)
import os
import re
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
INPUTS = os.path.join(REPO, "tests", "inputs")


def parse_emitted(log_path: str):
    """(threshold, checksum) from an --emit-checksum run's output, or
    None when the marker block is absent (failed/partial step)."""
    with open(log_path) as f:
        lines = [ln.strip() for ln in f]
    for i, ln in enumerate(lines):
        if ln.startswith("# checksum reference lines"):
            if (
                len(lines) >= i + 4
                and lines[i + 1] == "T"
            ):
                return float(lines[i + 2]), float(lines[i + 3])
    return None


def apply_to_recipe(path: str, threshold: float, ref: float,
                    dry_run: bool = False) -> bool:
    """Rewrite the recipe's checksum block: the first non-comment token
    after the '# checksum' comment block becomes T/threshold/ref."""
    with open(path) as f:
        text = f.read()
    # the block is '# checksum...' comment lines followed by 'F' (or a
    # previous T + values, which we replace wholesale to end-of-file —
    # the checksum block is the last section of the format)
    m = re.search(r"(# checksum[^\n]*\n(?:#[^\n]*\n)*)", text)
    if not m:
        print(f"  {os.path.basename(path)}: no '# checksum' block found")
        return False
    head = text[: m.end()]
    stamp = (
        f"T\n{threshold:.1E}\n{ref:.15E}\n"
    )
    new = head + stamp
    if dry_run:
        print(f"  would pin {os.path.basename(path)}: "
              f"threshold {threshold:g}, ref {ref:.15E}")
        return True
    with open(path, "w") as f:
        f.write(new)
    print(f"  pinned {os.path.basename(path)}: ref {ref:.15E}")
    return True


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    dry = "--dry-run" in argv
    argv = [a for a in argv if a != "--dry-run"]
    logdir = argv[0] if argv else "/tmp/chip_r3"
    n_ok = 0
    logs = sorted(
        f for f in os.listdir(logdir)
        if f.startswith("perf_") and f.endswith(".log")
    )
    if not logs:
        print(f"no perf_*.log files in {logdir}")
        return 1
    for log in logs:
        name = log[len("perf_"):-len(".log")]
        recipe = os.path.join(INPUTS, f"{name}.perf")
        if not os.path.exists(recipe):
            print(f"  {log}: no matching recipe {name}.perf")
            continue
        emitted = parse_emitted(os.path.join(logdir, log))
        if emitted is None:
            print(f"  {log}: no emitted checksum block (step failed?)")
            continue
        if apply_to_recipe(recipe, *emitted, dry_run=dry):
            n_ok += 1
    print(f"{n_ok}/{len(logs)} recipes {'would be ' if dry else ''}pinned")
    return 0 if n_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
