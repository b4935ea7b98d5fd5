"""Generate tests/corpus/tokenizer/zhtml_ray20_double_escaped.test —
cases using the html5lib ``doubleEscaped`` convention (literal
``\\uXXXX`` in input/output, unescaped once more by the runner; the
only way the upstream format can express lone surrogates). r4: the
runner previously skipped the convention; these cases prove the
unescape path incl. surrogate-pair combination and lone-surrogate
passthrough (the tokenizer emits lone surrogates as characters — the
surrogate-in-input-stream complaint is an input-stream error outside
the corpus collector)."""

import json
import os

CASES = [
    {"description": "desc: lone high surrogate passthrough",
     "doubleEscaped": True,
     "input": "\\uD800", "output": [["Character", "\\uD800"]]},
    {"description": "desc: lone low surrogate after tag open",
     "doubleEscaped": True,
     "input": "<\\uDC00", "output": [["Character", "<\\uDC00"]],
     "errors": [{"code": "invalid-first-character-of-tag-name"}]},
    {"description": "desc: astral via surrogate pair",
     "doubleEscaped": True,
     "input": "\\uDBC0\\uDC00;x",
     "output": [["Character", "\\uDBC0\\uDC00;x"]]},
    {"description": "desc: lone surrogate between entities",
     "doubleEscaped": True,
     "input": "a\\uD800&amp;b",
     "output": [["Character", "a\\uD800&b"]]},
]


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "corpus", "tokenizer",
        "zhtml_ray20_double_escaped.test")
    with open(out, "w") as f:
        json.dump({"tests": CASES}, f, indent=1, ensure_ascii=True)
        f.write("\n")
    print(f"wrote {len(CASES)} cases -> {out}")


if __name__ == "__main__":
    main()
