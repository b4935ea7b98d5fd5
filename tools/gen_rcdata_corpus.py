"""Generate tests/corpus/tokenizer/zhtml_ray8_rcdata.test — RCDATA /
RAWTEXT / PLAINTEXT / CDATA-section tokenizer families (spec 13.2.5.2-
.5, .9-.18, .69-.71): appropriate-end-tag matching, charref behavior
per state, NUL / CR handling, and the less-than / end-tag-open
fallthrough arms. Expected outputs are HAND-DERIVED from the spec
state machines (not baked from the engine), so a failure is a real
divergence to adjudicate."""

import json
import os

T = []


def c(desc, inp, out, errors=None, **kw):
    t = {"description": desc, "input": inp, "output": out}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    t.update(kw)
    T.append(t)


CH = "Character"
RC = {"initialStates": ["RCDATA state"], "lastStartTag": "title"}
RW = {"initialStates": ["RAWTEXT state"], "lastStartTag": "style"}
PT = {"initialStates": ["PLAINTEXT state"]}
SD = {"initialStates": ["Script data state"], "lastStartTag": "script"}
CD = {"initialStates": ["CDATA section state"]}

# ---- RCDATA (13.2.5.2, .9-.11): charrefs decode, appropriate end tag
c("rcdata appropriate end tag", "a</title>b",
  [[CH, "a"], ["EndTag", "title"], [CH, "b"]], **RC)
c("rcdata non-matching end tag", "a</b>c", [[CH, "a</b>c"]], **RC)
c("rcdata partial prefix end tag", "</titl>x", [[CH, "</titl>x"]], **RC)
c("rcdata longer end tag", "</titlex>y", [[CH, "</titlex>y"]], **RC)
c("rcdata uppercase appropriate end tag", "</TITLE>y",
  [["EndTag", "title"], [CH, "y"]], **RC)
c("rcdata end tag with attribute", "</title x=1>",
  [["EndTag", "title"]], ["end-tag-with-attributes"], **RC)
c("rcdata end tag trailing solidus", "</title/>",
  [["EndTag", "title"]], ["end-tag-with-trailing-solidus"], **RC)
c("rcdata end tag space then gt", "</title >",
  [["EndTag", "title"]], **RC)
c("rcdata charref decoded", "&amp;x", [[CH, "&x"]], **RC)
c("rcdata legacy charref no semicolon", "&amp x", [[CH, "& x"]],
  ["missing-semicolon-after-character-reference"], **RC)
c("rcdata numeric charref decoded", "&#65;bc", [[CH, "Abc"]], **RC)
c("rcdata null", "a\x00b", [[CH, "a�b"]],
  ["unexpected-null-character"], **RC)
c("rcdata cr and crlf normalized", "a\rb\r\nc", [[CH, "a\nb\nc"]], **RC)
c("rcdata lt not end tag open", "a<b", [[CH, "a<b"]], **RC)
c("rcdata lt slash non-alpha", "a</ title>", [[CH, "a</ title>"]], **RC)
c("rcdata lt lt slash", "<</title>",
  [[CH, "<"], ["EndTag", "title"]], **RC)
c("rcdata eof in end tag name", "x</titl", [[CH, "x</titl"]], **RC)
c("rcdata eof after appropriate name", "x</title",
  [[CH, "x</title"]], **RC)
c("rcdata no last start tag set", "</title>", [[CH, "</title>"]],
  initialStates=["RCDATA state"])
c("rcdata textarea end tag", "x</textarea>y",
  [[CH, "x"], ["EndTag", "textarea"], [CH, "y"]],
  initialStates=["RCDATA state"], lastStartTag="textarea")

# ---- RAWTEXT (13.2.5.3, .12-.14): NO charrefs
c("rawtext charref not decoded", "&amp;", [[CH, "&amp;"]], **RW)
c("rawtext appropriate end tag", "a</style>b",
  [[CH, "a"], ["EndTag", "style"], [CH, "b"]], **RW)
c("rawtext mixed-case end tag", "</StYlE>x",
  [["EndTag", "style"], [CH, "x"]], **RW)
c("rawtext non-matching end tag", "</div>x", [[CH, "</div>x"]], **RW)
c("rawtext null", "\x00", [[CH, "�"]],
  ["unexpected-null-character"], **RW)
c("rawtext stray lt and tag", "a<b>c</style>",
  [[CH, "a<b>c"], ["EndTag", "style"]], **RW)
c("rawtext end tag space gt", "</style >", [["EndTag", "style"]], **RW)
c("rawtext end tag with attr", "</style a=b>",
  [["EndTag", "style"]], ["end-tag-with-attributes"], **RW)
c("rawtext eof mid end tag", "a</sty", [[CH, "a</sty"]], **RW)

# ---- PLAINTEXT (13.2.5.5): everything is text forever
c("plaintext swallows markup", "a</plaintext><b>&amp;",
  [[CH, "a</plaintext><b>&amp;"]], **PT)
c("plaintext null", "a\x00b", [[CH, "a�b"]],
  ["unexpected-null-character"], **PT)
c("plaintext cr normalized", "a\r\nb\rc", [[CH, "a\nb\nc"]], **PT)

# ---- Script data (13.2.5.4, .15-.18) supplements
c("script data end tag", "a</script>b",
  [[CH, "a"], ["EndTag", "script"], [CH, "b"]], **SD)
c("script data non-matching end", "</scrip>x", [[CH, "</scrip>x"]], **SD)
c("script data charref not decoded", "&lt;", [[CH, "&lt;"]], **SD)

# ---- CDATA section (13.2.5.69-.71)
c("cdata section ends at ]]>", "x]]>y", [[CH, "xy"]], **CD)
c("cdata bracket run", "a]]]>b", [[CH, "a]b"]], **CD)
c("cdata lone brackets never close", "a]]b]>c", [[CH, "a]]b]>c"]],
  ["eof-in-cdata"], **CD)
c("cdata eof", "x", [[CH, "x"]], ["eof-in-cdata"], **CD)


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tokenizer", "zhtml_ray8_rcdata.test")
    with open(out, "w") as f:
        json.dump({"tests": T}, f, indent=1, ensure_ascii=False)
    print(f"wrote {len(T)} cases to {out}")


if __name__ == "__main__":
    main()
