"""Generate tests/corpus/tree/zhtml_ray7.dat — round-3e families:
form element pointer × table (13.2.6.4.9 'form in table' insert-and-
pop, 13.2.6.4.7 form end-tag remove-from-stack-not-pop), option /
optgroup implied pops in body, and PLAINTEXT / RCDATA elements foster-
parented out of tables (13.2.6.1 + tokenizer-mode interplay).

PROVENANCE / METHOD: expected trees frozen after per-case hand
adjudication against the named spec sections — same policy as
gen_tree_corpus3-6.py: rerunning RE-BAKES from the current engine and
destroys regression value; only rerun after re-adjudicating, and say
so in the commit message.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.dom import serialize  # noqa: E402
from zhtml_ray.html.treebuilder import parse  # noqa: E402

FAMILIES = {
    "F63 form element pointer x table (13.2.6.4.9: in-table form "
    "inserts-and-pops when pointer null; second form ignored; "
    "13.2.6.4.7 </form> removes from stack without popping deeper "
    "elements)": [
        "<table><form><input type=hidden></form></table>x",
        "<table><form><form><tr><td>a",
        "<form><table><form><tr><td>x",
        "<form>a</form><form>b",
        "<table><form>x",
        "<template><form>a</form></template>",
        "<form><div></form>b</div>c",
        "<form><table><tr><td><form>y",
    ],
    "F64 option/optgroup implied pops in body (13.2.6.4.7 'optgroup'/"
    "'option' start tags outside select)": [
        "<option>a<option>b",
        "<option>a<optgroup>b",
        "<select><option>a</select><option>b",
        "<optgroup><option>a<optgroup><option>b",
    ],
    "F65 PLAINTEXT/RCDATA fostered out of tables (13.2.6.1 foster + "
    "text insertion mode ignores fostering; tokenizer keeps consuming "
    "past the table end tag)": [
        "<table><plaintext>x</table>y",
        "<table><textarea>t</table>u",
        "<table><tr><plaintext>z",
        "<table><style>s</style><tr><td>a",
    ],
}


def main():
    parts = []
    n = 0
    for cases in FAMILIES.values():
        for c in cases:
            tree = serialize(parse(c).document)
            parts.append(f"#data\n{c}\n#errors\n#document\n{tree}\n")
            n += 1
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tree", "zhtml_ray7.dat")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {n} cases to {out}")


if __name__ == "__main__":
    main()
