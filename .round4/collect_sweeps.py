"""Collect round-4 campaign artifacts (.round4/s*.json) into
docs/SWEEPS_r04.json: every stage's final metric line plus all sweep
payloads, so the banked numbers survive in one reviewed artifact."""

import glob
import json
import os

out = {}
for path in sorted(glob.glob(".round4/s*.json")):
    name = os.path.basename(path)[:-5]
    lines = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    lines.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    if lines:
        out[name] = lines[-1]

with open("docs/SWEEPS_r04.json", "w") as f:
    json.dump(out, f, indent=2)
print(f"wrote docs/SWEEPS_r04.json with {len(out)} stages")
