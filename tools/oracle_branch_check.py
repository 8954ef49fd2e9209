#!/usr/bin/env python3
"""Cross-check the q33 DuckDB twin's degenerate branches (empty / 1-byte /
2-byte payloads) against the StubCodec ground truth, on a synthetic
documents table the sf corpora don't cover.

Usage: python3 tools/oracle_branch_check.py <verifyOutDir-with-oracle_sql.json>
"""
import sys, json
import duckdb


def stub_meta(b: bytes):
    if len(b) == 0:
        fmt = "empty"
    elif b[0] % 3 == 0:
        fmt = "img/fake-png"
    elif b[0] % 3 == 1:
        fmt = "audio/fake-wav"
    else:
        fmt = "video/fake-mp4"
    width = 16 * (b[1] % 40 + 1) if len(b) > 1 else 0
    height = 16 * (b[2] % 30 + 1) if len(b) > 2 else 0
    return fmt, width, height, len(b)


def main(out_dir):
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["q33_multimodal_stats"]
    fixtures = [(1, ""), (2, "A"), (3, "AB"), (4, "some longer document"),
                (5, "x"), (6, "")]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", fixtures)
    got = {r[0]: r[1:] for r in con.execute(sql).fetchall()}

    expect = {}
    for _, text in fixtures:
        fmt, w, h, n = stub_meta(text.encode("utf-8"))
        e = expect.setdefault(fmt, [0, 0, 0, 0])
        e[0] += 1; e[1] += n; e[2] = max(e[2], w); e[3] = max(e[3], h)

    ok = True
    for fmt, (cnt, total, mw, mh) in sorted(expect.items()):
        g = got.get(fmt)
        if g != (cnt, total, mw, mh):
            print(f"FAIL {fmt}: oracle={g} expected={(cnt, total, mw, mh)}")
            ok = False
        else:
            print(f"PASS {fmt}: {g}")
    if set(got) != set(expect):
        print(f"FAIL format sets differ: oracle={set(got)} expected={set(expect)}")
        ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out")
