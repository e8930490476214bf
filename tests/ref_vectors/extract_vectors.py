"""Extract the reference implementation's inline test vectors into JSON.

Reads the `#[cfg(test)]` modules of ruffle-rs/h263-rs (the upstream
reference, expected at /root/reference) and mechanically converts the
hand-authored bit patterns, expected VLC symbol sequences, golden RGBA
images, and deblock quartet tables into JSON fixtures under this
directory.  The fixtures are checked in; tests (test_reference_vectors.py)
read only the JSON, so the suite runs without the reference tree.

Provenance per fixture file:
  reader.json      <- h263/src/parser/reader.rs:444-560 (ported by hand in
                      test_reference_vectors.py; no fixture needed)
  macroblock.json  <- h263/src/parser/macroblock.rs:551-1010
  tcoef.json       <- h263/src/parser/block.rs:757-1705 (full table walk)
  yuv.json         <- yuv/src/bt601.rs:198-483
  deblock.json     <- deblock/src/deblock.rs:319-559

Run:  python tests/ref_vectors/extract_vectors.py [/path/to/reference]
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

HERE = pathlib.Path(__file__).parent
REF = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")


def parse_int(tok: str) -> int:
    tok = tok.strip().rstrip(",")
    tok = re.sub(r"(u8|u16|u32|i8|i16|i32|f32)$", "", tok)
    tok = tok.replace("_", "")
    return int(tok, 0)


def parse_byte_array(text: str) -> list[int]:
    text = re.sub(r"//[^\n]*", "", text)  # strip line comments
    return [parse_int(t) for t in text.split(",") if t.strip()]


def extract_fn(source: str, name: str) -> str:
    """Return the body text of `fn name() { ... }` (balanced braces)."""
    m = re.search(rf"fn {name}\(\)\s*\{{", source)
    assert m, f"fn {name} not found"
    depth = 0
    for i in range(m.end() - 1, len(source)):
        if source[i] == "{":
            depth += 1
        elif source[i] == "}":
            depth -= 1
            if depth == 0:
                return source[m.end() : i]
    raise AssertionError(f"unbalanced braces in fn {name}")


def extract_bit_pattern(body: str, var: str = "bit_pattern") -> list[int]:
    m = re.search(rf"let {var}[^=]*=\s*&\[(.*?)\];", body, re.S)
    assert m, f"{var} not found"
    return parse_byte_array(m.group(1))


_ASSERT_VLC = re.compile(
    r"assert_eq!\(\s*reader\s*\.\s*read_vlc\(&(\w+)\)\s*\.unwrap\(\)\s*,"
    r"\s*(.*?)\s*\)\s*;",
    re.S,
)


def parse_expected(value: str):
    """Rust expected-value expression -> JSON-friendly form."""
    value = re.sub(r"\s+", " ", value.strip())
    if value == "None":
        return None
    m = re.fullmatch(
        r"BlockPatternEntry::Valid\(MacroblockType::(\w+), (\w+), (\w+)\)", value)
    if m:
        return {"mb_type": m.group(1), "cb": m.group(2) == "true",
                "cr": m.group(3) == "true"}
    if value == "BlockPatternEntry::Stuffing":
        return "stuffing"
    if value == "BlockPatternEntry::Invalid":
        return "invalid"
    m = re.fullmatch(r"\((\w+), (\w+)\)", value)
    if m:  # MODB (bool, bool)
        return [m.group(1) == "true", m.group(2) == "true"]
    m = re.fullmatch(r"Some\(\[([^\]]*)\]\)", value)
    if m:  # CBPY Some([bool;4])
        return [t.strip() == "true" for t in m.group(1).split(",")]
    m = re.fullmatch(r"Some\((-?\d+\.\d+)\)", value)
    if m:  # MVD Some(f32) — full-pel float
        return float(m.group(1))
    m = re.fullmatch(
        r"Some\(ShortTCoefficient::Run \{ last: (\w+), run: (\d+), "
        r"level: (\d+),? \}\)", value)
    if m:
        return {"last": m.group(1) == "true", "run": int(m.group(2)),
                "level": int(m.group(3))}
    if value == "Some(ShortTCoefficient::EscapeToLong)":
        return "escape"
    raise AssertionError(f"unparsed expected value: {value!r}")


def extract_vlc_walk(source: str, fn_name: str) -> dict:
    body = extract_fn(source, fn_name)
    pattern = extract_bit_pattern(body)
    asserts = _ASSERT_VLC.findall(body)
    assert asserts, f"no read_vlc asserts in {fn_name}"
    tables = {t for t, _ in asserts}
    assert len(tables) == 1, f"mixed tables in {fn_name}: {tables}"
    return {
        "source_fn": fn_name,
        "table": asserts[0][0],
        "bit_pattern": pattern,
        "expected": [parse_expected(v) for _, v in asserts],
    }


def macroblock_fixture():
    src = (REF / "h263/src/parser/macroblock.rs").read_text()
    out = {
        "provenance": "h263/src/parser/macroblock.rs:551-1010",
        "walks": [
            extract_vlc_walk(src, "macroblock_mcbpc_iframe"),
            extract_vlc_walk(src, "macroblock_mcbpc_pframe"),
            extract_vlc_walk(src, "macroblock_modb_table"),
            extract_vlc_walk(src, "macroblock_cbpy_table"),
            extract_vlc_walk(src, "macroblock_mvd_table"),
        ],
    }
    (HERE / "macroblock.json").write_text(json.dumps(out, indent=1))
    counts = [len(w["expected"]) for w in out["walks"]]
    print("macroblock.json:", counts, "asserts")


def tcoef_fixture():
    src = (REF / "h263/src/parser/block.rs").read_text()
    out = {
        "provenance": "h263/src/parser/block.rs:766-1705 (fn tcoef_table)",
        "walk": extract_vlc_walk(src, "tcoef_table"),
    }
    (HERE / "tcoef.json").write_text(json.dumps(out, indent=1))
    print("tcoef.json:", len(out["walk"]["expected"]), "asserts")


_ASSERT_YUV420 = re.compile(
    r"assert_eq!\(\s*yuv420_to_rgba\(\s*&\[(.*?)\]\s*,\s*&\[(.*?)\]\s*,"
    r"\s*&\[(.*?)\]\s*,\s*(\d+)\s*,?\s*\)\s*,\s*vec!\[(.*?)\]\s*,?\s*\)\s*;",
    re.S,
)
_ASSERT_YUV_SCALAR = re.compile(
    r"assert_eq!\(yuv_to_rgb\(\((\d+), (\d+), (\d+)\)\), "
    r"\((\d+), (\d+), (\d+)\)\);")


def yuv_fixture():
    src = (REF / "yuv/src/bt601.rs").read_text()
    scalar = [
        {"yuv": [int(a), int(b), int(c)], "rgb": [int(d), int(e), int(f)]}
        for a, b, c, d, e, f in _ASSERT_YUV_SCALAR.findall(
            extract_fn(src, "test_yuv_to_rgb"))
    ]
    images = []
    for block in (extract_fn(src, "test_yuv420_to_rgba_tiny"),
                  extract_fn(src, "test_yuv420_to_rgba_medium")):
        for y, cb, cr, w, rgba in _ASSERT_YUV420.findall(block):
            if ";" in rgba:  # vec![0u8; 0] — the empty-picture case
                rgba_vals: list[int] = []
            else:
                rgba_vals = parse_byte_array(rgba)
            images.append({
                "y": parse_byte_array(y),
                "cb": parse_byte_array(cb),
                "cr": parse_byte_array(cr),
                "y_width": int(w),
                "rgba": rgba_vals,
            })
    assert len(scalar) == 10 and len(images) >= 6, (len(scalar), len(images))
    out = {"provenance": "yuv/src/bt601.rs:198-483",
           "scalar": scalar, "images": images}
    (HERE / "yuv.json").write_text(json.dumps(out, indent=1))
    print(f"yuv.json: {len(scalar)} scalar + {len(images)} golden images")


_QUARTET = re.compile(
    r"\(\((\d+), (\d+), (\d+), (\d+)\), (\d+), "
    r"\((\d+), (\d+), (\d+), (\d+)\)\)")


def deblock_fixture():
    src = (REF / "deblock/src/deblock.rs").read_text()
    quartets = [
        {"input": [int(a), int(b), int(c), int(d)], "strength": int(s),
         "output": [int(e), int(f), int(g), int(h)]}
        for a, b, c, d, s, e, f, g, h in _QUARTET.findall(
            extract_fn(src, "test_process"))
    ]
    body = extract_fn(src, "test_deblock")

    def arr(name):
        m = re.search(rf"let {name}: &\[u8\] = &\[(.*?)\];", body, re.S)
        assert m, name
        return parse_byte_array(m.group(1))

    out = {
        "provenance": "deblock/src/deblock.rs:319-559",
        "quartets": quartets,
        "image": {"width": 11, "data": arr("data"),
                  "expected": {"4": arr("expected_4"),
                               "8": arr("expected_8"),
                               "12": arr("expected_12")}},
    }
    assert len(quartets) == 37, len(quartets)
    for k, v in out["image"]["expected"].items():
        assert len(v) == len(out["image"]["data"]) == 11 * 17, k
    (HERE / "deblock.json").write_text(json.dumps(out, indent=1))
    print(f"deblock.json: {len(quartets)} quartets + 3 golden images")


if __name__ == "__main__":
    macroblock_fixture()
    tcoef_fixture()
    yuv_fixture()
    deblock_fixture()
    print("ok")
