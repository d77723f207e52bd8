#!/usr/bin/env python3
"""Value-level doc-sync guard for SURVEY.md §8 (r13, verdict item 1).

The placeholder grep catches unfilled `R<N>TODO` tokens; this catches the
failure mode that survived five rounds in five costumes: a §8 headline
number whose cited artifact was later overwritten (or never matched).

Rule: inside §8, a bold wall bound to an artifact in one of the two
canonical citation forms —

  A. `name.json`: **X s** (... N entries ...)     (citation, colon, wall)
  B. ... **X s** (`name.json` ...)                (wall, parenthesized cite)

must match the artifact's top-level `value` after rounding to one decimal
(space/comma digit grouping accepted), and an `N entries` phrase within
80 chars after a form-A wall must match `len(artifact["queries"])`.
Publishing convention: a §8 headline wall is only guarded when written in
one of these forms — so WRITE THEM IN ONE OF THESE FORMS; a plain
(non-bold) number is prose, not a claim.

Round resolution: the nearest preceding `### r<N>` header selects
`artifacts/r<N>/`; an explicit `rK/name.json` citation overrides; if the
file is absent there, a unique match across `artifacts/*/` is used; an
ambiguous or missing file is a WARNING (prose about untracked/superseded
files), a resolved-but-mismatched value is a FAILURE.

Exit 0 = all cited values reproduce from tracked files.
"""
import json
import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SURVEY = os.path.join(REPO, "SURVEY.md")

def parse_num(s: str) -> float:
    return float(re.sub(r"[^\d.]", "", s))

def main() -> int:
    text = open(SURVEY, encoding="utf-8").read()
    m = re.search(r"^## §8", text, re.M)
    if not m:
        print("check_survey: no §8 header found", file=sys.stderr)
        return 2
    s8 = text[m.start():]

    # nearest-preceding round header for each offset
    headers = [(h.start(), int(h.group(1)))
               for h in re.finditer(r"^### .*?\br(\d+)\b", s8, re.M)]

    CITE = r"`(?:r(\d+)/)?([a-z][a-z0-9_]*\.json)`"
    NUM = r"\*\*([\d,\s]*\d(?:\.\d+)?)\ss\*\*"
    # claims: (offset, explicit_round, fname, wall_text, entries_claim)
    claims = []
    for c in re.finditer(CITE + r"\s*:\s*" + NUM, s8):  # form A
        ent = re.search(r"(\d+) entries", s8[c.end():c.end() + 80])
        claims.append((c.start(), c.group(1), c.group(2), c.group(3),
                       int(ent.group(1)) if ent else None))
    for c in re.finditer(NUM + r"\s*\(" + CITE, s8):  # form B
        claims.append((c.start(), c.group(2), c.group(3), c.group(1), None))

    failures, warnings, checked = [], [], 0
    for off, explicit_round, fname, wall_txt, entries_claim in claims:
        rnd = explicit_round
        if rnd is None:
            prior = [n for hoff, n in headers if hoff < off]
            rnd = str(prior[-1]) if prior else None
        path = os.path.join(REPO, "artifacts", f"r{rnd}", fname) if rnd else None
        if not path or not os.path.exists(path):
            cands = sorted(glob.glob(os.path.join(REPO, "artifacts", "r*", fname)))
            if len(cands) == 1:
                path = cands[0]
            elif not cands:
                warnings.append(f"{fname}: cited with a bold wall but not "
                                f"tracked anywhere under artifacts/")
                continue
            else:
                warnings.append(f"{fname}: ambiguous ({len(cands)} tracked "
                                f"copies, no r{rnd} copy) — skipped")
                continue
        try:
            art = json.load(open(path))
        except Exception as e:  # unreadable artifact is a failure, not a warning
            failures.append(f"{fname}: unreadable ({e})")
            continue

        rel = os.path.relpath(path, REPO)
        checked += 1
        claimed = parse_num(wall_txt)
        actual = art.get("value")
        if actual is None or abs(round(float(actual), 1) - claimed) > 0.051:
            failures.append(f"{rel}: §8 claims **{wall_txt} s** but "
                            f"artifact value = {actual}")
        if entries_claim is not None:
            checked += 1
            actual_n = len(art.get("queries", {}))
            if actual_n != entries_claim:
                failures.append(f"{rel}: §8 claims {entries_claim} entries "
                                f"but artifact has {actual_n}")

    for w in warnings:
        print(f"WARN  {w}")
    for f in failures:
        print(f"FAIL  {f}")
    print(f"check_survey: {checked} value(s) checked, "
          f"{len(failures)} failed, {len(warnings)} warning(s)")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main())
