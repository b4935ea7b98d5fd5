"""One-shot: inject the literal-NUL tokenizer cases (escaped here so no
raw control bytes appear in shell commands)."""
import json

p = "tests/corpus/tokenizer/zhtml_ray2.test"
d = json.load(open(p))
for t in d["tests"]:
    if t["description"] == "nul kept in data":
        t["input"] = "a\x00b"
        t["output"] = [["Character", "a\x00b"]]
    if t["description"] == "plaintext nul":
        t["input"] = "a<b>\x00c"
        t["output"] = [["Character", "a<b>�c"]]
with open(p, "w") as f:
    json.dump(d, f, indent=1, ensure_ascii=False)
print("patched")
