#!/usr/bin/env python3
"""Round-close gate: the LAST step before the end-of-round commit.

The r13 regression shipped because the final snapshot commit changed
oracle-affecting arithmetic AFTER the last full primary-gate run — the
gate ledger was green, head was not. This wrapper mechanizes the rule
from VERDICT r13 #2: any commit touching `SparkEntry.oracleSql` or
serve arithmetic re-runs the full sf0.01 primary gate before close,
no exceptions.

Protocol:
  1. REFUSES to run on a dirty working tree — the gate must measure
     the exact tree that will be head, not head plus uncommitted edits.
  2. Runs the full primary gate (tools/verify_local.py at sf0.01 —
     the driver's exact compare) against the current HEAD.
  3. REFUSES the close (exit 1) on any red row.
  4. On green, writes CLOSE_GATE.json recording {head_sha, pass, fail}
     — commit that file as the round's close evidence. The evidence
     commit itself touches no oracle or arithmetic, so it is exempt by
     construction; anything else landing after this run voids it.

Usage: python3 tools/close_gate.py [sf_dir]
"""
import json, re, subprocess, sys, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPO = subprocess.run(["git", "rev-parse", "--show-toplevel"],
                      capture_output=True, text=True).stdout.strip()

dirty = subprocess.run(["git", "status", "--porcelain"],
                       capture_output=True, text=True, cwd=REPO).stdout
# the evidence file itself may linger from a voided earlier run
dirty = "\n".join(l for l in dirty.splitlines()
                  if l.strip() and not l.endswith("CLOSE_GATE.json"))
if dirty:
    sys.exit(f"REFUSED: working tree is dirty — commit first, then run "
             f"the close gate at the exact head:\n{dirty}")

head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                      text=True, cwd=REPO).stdout.strip()
print(f"close gate: running the full sf0.01 primary gate at {head[:12]}")

t0 = time.time()
r = subprocess.run(["python3", "tools/verify_local.py", SF,
                    "/tmp/close_gate_out"],
                   capture_output=True, text=True, cwd=REPO)
tail = r.stdout[-4000:]
sys.stdout.write(tail)
m = re.search(r"== (\d+) pass, (\d+) fail ==", r.stdout)
if not m or r.returncode != 0:
    sys.exit(f"REFUSED: primary gate did not complete cleanly "
             f"(rc={r.returncode}) — fix before closing the round")
n_pass, n_fail = int(m.group(1)), int(m.group(2))
if n_fail:
    fails = [l for l in r.stdout.splitlines() if l.startswith("FAIL")]
    sys.exit("REFUSED: primary gate is RED at head — the round must "
             "not close:\n" + "\n".join(fails))

evidence = {"head_sha": head, "sf": SF, "pass": n_pass, "fail": n_fail,
            "elapsed_sec": round(time.time() - t0, 1),
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
with open(f"{REPO}/CLOSE_GATE.json", "w") as f:
    json.dump(evidence, f, indent=1)
    f.write("\n")
print(f"close gate GREEN: {n_pass}/{n_pass} at {head[:12]} — commit "
      f"CLOSE_GATE.json as the round's close evidence")
