"""End-to-end test of the HTTP serving adapter: the reference's REST
routes (create library -> document -> chunks -> query, plus 404/409
paths and cascade delete) against a live ThreadingHTTPServer bound to
a VectorDB. Mirrors the reference's own e2e shape (tests/e2e.py) with
the deterministic embedder instead of Cohere."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from local_vectordb_spark.api import VectorDB
from local_vectordb_spark.serving import make_server

QUESTIONS = [
    "what is the capital of germany",
    "how do rainbows form in the sky",
    "who wrote the origin of species",
]


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    db = VectorDB(spark, str(tmp_path_factory.mktemp("serve_db")))
    srv = make_server(db)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _req(base, method, path, body=None):
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(base + path, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, json.loads(raw) if raw else None


def test_full_rest_flow(server):
    assert _req(server, "GET", "/health")[0] == 200
    assert _req(server, "POST", "/reset")[0] == 200

    code, lib = _req(server, "POST", "/libraries", {"name": "corpus"})
    assert code == 201
    lib_id = lib["id"]

    # FK validation: document with a bogus parent is rejected
    code, _ = _req(
        server, "POST", "/documents", {"name": "d", "library_id": "nope"}
    )
    assert code == 404

    code, doc = _req(
        server, "POST", "/documents", {"name": "faq", "library_id": lib_id}
    )
    assert code == 201
    doc_id = doc["id"]

    chunk_ids = []
    for q in QUESTIONS:
        code, ch = _req(
            server, "POST", "/chunks", {"content": q, "document_id": doc_id}
        )
        assert code == 201
        assert ch["embedding"] is not None  # embedded on create
        chunk_ids.append(ch["id"])

    # duplicate id rejected with 409 (C9)
    code, _ = _req(
        server,
        "POST",
        "/chunks",
        {"id": chunk_ids[0], "content": "dup", "document_id": doc_id},
    )
    assert code == 409

    # query: exact-match content must surface as top hit with ~1.0 score
    code, res = _req(
        server,
        "POST",
        "/query",
        {"collection": "chunks", "index_type": "COSINE", "text": QUESTIONS[1], "limit": 2},
    )
    assert code == 200
    top = res["results"][0]
    assert top["content"] == QUESTIONS[1]
    assert top["confidence"] == pytest.approx(1.0, abs=1e-5)

    # unknown index type is a 400, like the reference's unconfigured-index path
    code, _ = _req(server, "POST", "/query", {"index_type": "bogus", "text": "x"})
    assert code == 400

    # partial update re-embeds changed content (PUT path)
    code, updated = _req(
        server, "PUT", f"/chunks/{chunk_ids[0]}", {"content": "fresh text"}
    )
    assert code == 200 and updated["content"] == "fresh text"

    # cascade: deleting the library removes documents and chunks
    assert _req(server, "DELETE", f"/libraries/{lib_id}")[0] == 204
    assert _req(server, "GET", f"/documents/{doc_id}")[0] == 404
    assert _req(server, "GET", "/chunks")[1] == []


def test_point_lookup_404(server):
    assert _req(server, "GET", "/libraries/does-not-exist")[0] == 404
    assert _req(server, "GET", "/nonsense")[0] == 404


def test_malformed_requests_get_http_errors_not_resets(server):
    """Bad inputs must come back as HTTP 4xx responses, never a closed
    socket: malformed JSON, a non-integer limit, and a non-dict
    metadata each hit the error envelope."""
    req = urllib.request.Request(
        server + "/libraries", data=b"not json {", method="POST"
    )
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            code = resp.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400

    code, _ = _req(server, "POST", "/query", {"text": "x", "limit": "abc"})
    assert code == 400

    code, lib = _req(server, "POST", "/libraries", {"name": "m"})
    assert code == 201
    code, _ = _req(
        server,
        "POST",
        "/documents",
        {"name": "d", "library_id": lib["id"], "metadata": [1, 2]},
    )
    assert code == 400


def test_list_pagination(server):
    """VERDICT r5 #8: listings return id-ordered pages via
    limit/offset, never the whole table; pages concatenate to the full
    id-sorted listing and bad parameters answer 400."""
    assert _req(server, "POST", "/reset")[0] == 200
    ids = []
    for i in range(5):
        code, lib = _req(server, "POST", "/libraries", {"name": f"lib{i}"})
        assert code == 201
        ids.append(lib["id"])
    expect = sorted(ids)

    code, page1 = _req(server, "GET", "/libraries?limit=2&offset=0")
    code2, page2 = _req(server, "GET", "/libraries?limit=2&offset=2")
    code3, page3 = _req(server, "GET", "/libraries?limit=2&offset=4")
    assert (code, code2, code3) == (200, 200, 200)
    assert [len(page1), len(page2), len(page3)] == [2, 2, 1]
    assert [r["id"] for r in page1 + page2 + page3] == expect

    # default page (limit 100) covers the demo corpus in one request
    code, allrows = _req(server, "GET", "/libraries")
    assert code == 200 and [r["id"] for r in allrows] == expect

    code, _ = _req(server, "GET", "/libraries?limit=-1")
    assert code == 400
    code, _ = _req(server, "GET", "/libraries?offset=frogs")
    assert code == 400


def test_seed_demo_flow(server, spark):
    """The `make seed` analogue (tools/seed_demo.py): reset -> load 10
    fixture documents over HTTP -> query returns ranked hydrated hits
    with confidences in descending order."""
    from tools.seed_demo import query, seed

    lib_id = seed(server, spark, n_docs=10)
    assert lib_id
    results = query(server, "What is the capital of Germany?")
    assert len(results) == 5
    confs = [r["confidence"] for r in results]
    assert confs == sorted(confs, reverse=True)
    assert all(r["content"] for r in results)


def test_put_reparent_onto_missing_parent_404s(server):
    """A PUT that retargets a chunk at a nonexistent parent document
    must 404 with nothing applied (the reference's update_chunk path
    404s via get_document) — the REST face of the r9 FK fix."""
    _req(server, "POST", "/reset")
    _, lib = _req(server, "POST", "/libraries", {"name": "l"})
    _, doc = _req(
        server, "POST", "/documents", {"name": "d", "library_id": lib["id"]}
    )
    _, ch = _req(
        server, "POST", "/chunks", {"content": "hello", "document_id": doc["id"]}
    )
    code, body = _req(
        server, "PUT", f"/chunks/{ch['id']}", {"document_id": "nope"}
    )
    assert code == 404 and "parent" in body["detail"]
    code, got = _req(server, "GET", f"/chunks/{ch['id']}")
    assert code == 200 and got["document_id"] == doc["id"]

    # and a VALID re-parent still applies
    _, doc2 = _req(
        server, "POST", "/documents", {"name": "d2", "library_id": lib["id"]}
    )
    code, body = _req(
        server, "PUT", f"/chunks/{ch['id']}", {"document_id": doc2["id"]}
    )
    assert code == 200 and body["document_id"] == doc2["id"]


def test_time_travel_reads_pre_delete_snapshot_over_http(server):
    """r10 verdict #7: GET accepts ?version=N — an e2e read of a
    pre-delete snapshot through HTTP. The deleted chunk 404s on the
    live route but is still served from the pinned prior version;
    a GC'd / future / malformed version answers 404/400."""
    assert _req(server, "POST", "/reset")[0] == 200
    _, lib = _req(server, "POST", "/libraries", {"name": "tt"})
    _, doc = _req(
        server, "POST", "/documents", {"name": "d", "library_id": lib["id"]}
    )
    _, kept = _req(
        server, "POST", "/chunks", {"content": "kept row", "document_id": doc["id"]}
    )
    _, doomed = _req(
        server, "POST", "/chunks", {"content": "doomed row", "document_id": doc["id"]}
    )
    # the list response echoes the generation it served — the client's
    # handle for pinning THIS snapshot across later writes
    req = urllib.request.Request(server + "/chunks?limit=10", method="GET")
    with urllib.request.urlopen(req) as resp:
        pre_v = int(resp.headers["X-Table-Version"])
        pre = json.loads(resp.read())
    assert len(pre) == 2

    assert _req(server, "DELETE", f"/chunks/{doomed['id']}")[0] == 204
    # live route: gone
    assert _req(server, "GET", f"/chunks/{doomed['id']}")[0] == 404
    code, live = _req(server, "GET", "/chunks?limit=10")
    assert code == 200 and [r["id"] for r in live] == sorted([kept["id"]])

    # pinned pre-delete version: both rows, fetch-by-id works — and the
    # item 200 carries the same snapshot-pinning echo as the list route
    # (r11 ADVICE: the header was documented as the client's handle but
    # only the list route sent it)
    code, old = _req(server, "GET", f"/chunks?limit=10&version={pre_v}")
    assert code == 200 and len(old) == 2
    req = urllib.request.Request(
        server + f"/chunks/{doomed['id']}?version={pre_v}", method="GET"
    )
    with urllib.request.urlopen(req) as resp:
        assert int(resp.headers["X-Table-Version"]) == pre_v
        got = json.loads(resp.read())
    assert got["content"] == "doomed row"

    # future version -> 404 with the retention hint; malformed -> 400
    code, body = _req(server, "GET", "/chunks?version=99")
    assert code == 404 and "retained" in body["detail"]
    assert _req(server, "GET", "/chunks?version=abc")[0] == 400
    # negative version -> 404, NOT a silent live read: pin=None is the
    # never-written-table path, and a client pinning version=-1 would
    # otherwise read data that drifts across commits (r11 ADVICE)
    code, body = _req(server, "GET", "/chunks?version=-1")
    assert code == 404 and "never existed" in body["detail"]
    assert _req(
        server, "GET", f"/chunks/{doomed['id']}?version=-1"
    )[0] == 404

    # version is a READ pin: a write verb carrying it answers 400
    # instead of silently mutating the live head under a client that
    # believes it targeted a snapshot (r12)
    code, body = _req(server, "POST", "/chunks?version=0",
                      {"content": "x", "document_id": doc["id"]})
    assert code == 400 and "GET reads only" in body["detail"]
    assert _req(server, "PUT", f"/chunks/{kept['id']}?version={pre_v}",
                {"content": "y"})[0] == 400
    assert _req(server, "DELETE", f"/chunks/{kept['id']}?version=0")[0] == 400
    # the kept row survived the rejected write verbs
    assert _req(server, "GET", f"/chunks/{kept['id']}")[0] == 200

    # time-travel SEARCH over HTTP (r12): /query with body version=N
    # serves the pinned snapshot — the deleted row is findable at its
    # pre-delete generation and invisible live; the response echoes
    # the generation served; bad pins answer 404
    code, res = _req(server, "POST", "/query",
                     {"text": "doomed row", "limit": 2})
    assert code == 200
    assert all(r["content"] != "doomed row" for r in res["results"])
    req = urllib.request.Request(
        server + "/query", method="POST",
        data=json.dumps({"text": "doomed row", "limit": 2,
                         "version": pre_v}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        assert int(resp.headers["X-Table-Version"]) == pre_v
        res = json.loads(resp.read())
    assert res["results"][0]["content"] == "doomed row"
    assert _req(server, "POST", "/query",
                {"text": "x", "version": -1})[0] == 404
    assert _req(server, "POST", "/query",
                {"text": "x", "version": 99})[0] == 404


def test_query_route_nsw_knobs(server):
    """POST /query passes beam/hops through to the nsw traversal; a
    non-nsw index with the knobs answers 400 (search() validates)."""
    assert _req(server, "POST", "/reset")[0] == 200
    _, lib = _req(server, "POST", "/libraries", {"name": "knobs"})
    _, doc = _req(
        server, "POST", "/documents", {"name": "d", "library_id": lib["id"]}
    )
    for q in QUESTIONS:
        assert _req(
            server, "POST", "/chunks", {"content": q, "document_id": doc["id"]}
        )[0] == 201

    code, res = _req(server, "POST", "/query", {
        "text": QUESTIONS[2], "index_type": "nsw", "limit": 2,
        "beam": 4, "hops": 1,
    })
    assert code == 200
    assert res["results"][0]["content"] == QUESTIONS[2]

    code, body = _req(server, "POST", "/query", {
        "text": QUESTIONS[2], "index_type": "cosine", "beam": 4,
    })
    assert code == 400 and "nsw" in body["detail"]


def test_query_version_must_be_json_integer(server):
    """r12 ADVICE: int(body['version']) silently truncated a float pin
    (3.7 -> 3) and coerced booleans (true -> 1), so a malformed pin
    could serve a DIFFERENT generation than the client asked for. A
    non-integer JSON version answers 400 like the GET routes' strict
    parse; a real integer pin still works."""
    assert _req(server, "POST", "/reset")[0] == 200
    _, lib = _req(server, "POST", "/libraries", {"name": "strict"})
    _, doc = _req(
        server, "POST", "/documents", {"name": "d", "library_id": lib["id"]}
    )
    assert _req(
        server, "POST", "/chunks", {"content": "pinned row", "document_id": doc["id"]}
    )[0] == 201

    for bad in (3.7, True, False, "0", [0]):
        code, body = _req(
            server, "POST", "/query", {"text": "pinned row", "version": bad}
        )
        assert code == 400 and "integer" in body["detail"], bad

    req = urllib.request.Request(server + "/chunks?limit=1", method="GET")
    with urllib.request.urlopen(req) as resp:
        live_v = int(resp.headers["X-Table-Version"])
    code, res = _req(
        server, "POST", "/query", {"text": "pinned row", "version": live_v}
    )
    assert code == 200 and res["results"][0]["content"] == "pinned row"


def test_changes_route_serves_net_feed_and_410s_broken_log(server):
    """GET /{kind}/_changes?since=N (r13): the change-data feed over
    HTTP — net changes with X-Table-Version as the next poll's since;
    410 Gone when the log cannot serve a complete feed from the base."""
    assert _req(server, "POST", "/reset")[0] == 200
    _, lib = _req(server, "POST", "/libraries", {"name": "cdc"})
    _, doc = _req(
        server, "POST", "/documents", {"name": "d", "library_id": lib["id"]}
    )
    _, kept = _req(
        server, "POST", "/chunks", {"content": "kept row", "document_id": doc["id"]}
    )
    req = urllib.request.Request(server + "/chunks?limit=1", method="GET")
    with urllib.request.urlopen(req) as resp:
        base_v = int(resp.headers["X-Table-Version"])

    _, added = _req(
        server, "POST", "/chunks", {"content": "new row", "document_id": doc["id"]}
    )
    assert _req(server, "DELETE", f"/chunks/{kept['id']}")[0] == 204

    req = urllib.request.Request(
        server + f"/chunks/_changes?since={base_v}", method="GET"
    )
    with urllib.request.urlopen(req) as resp:
        served_v = int(resp.headers["X-Table-Version"])
        feed = json.loads(resp.read())
    assert {(r["change_type"], r["id"]) for r in feed} == {
        ("upsert", added["id"]), ("remove", kept["id"])
    }
    # the echoed generation is the next poll's since: an empty feed
    code, nxt = _req(server, "GET", f"/chunks/_changes?since={served_v}")
    assert code == 200 and nxt == []

    # reset breaks the log: a feed crossing it is PERMANENTLY
    # unservable from that base -> 410 Gone, re-read the snapshot
    assert _req(server, "POST", "/reset")[0] == 200
    _, lib2 = _req(server, "POST", "/libraries", {"name": "cdc2"})
    _, doc2 = _req(
        server, "POST", "/documents", {"name": "d2", "library_id": lib2["id"]}
    )
    assert _req(
        server, "POST", "/chunks", {"content": "post-reset", "document_id": doc2["id"]}
    )[0] == 201
    code, body = _req(server, "GET", "/chunks/_changes?since=0")
    assert code == 410 and "no change record" in body["detail"]

    # parameter contract: missing since 400, malformed since 400,
    # negative version 404
    assert _req(server, "GET", "/chunks/_changes")[0] == 400
    assert _req(server, "GET", "/chunks/_changes?since=abc")[0] == 400
    assert _req(server, "GET", "/chunks/_changes?since=0&version=-1")[0] == 404


def test_changes_410_vs_404_split_is_typed_not_message_matched(
    spark, tmp_path, monkeypatch
):
    """r13 verdict #6: the broken-chain 410 must be selected by
    exception TYPE (api.IncompleteChangeLog), never by message
    substring — a rewording of the error text must not silently turn
    every 410 into a 404 (telling pollers "bad version" instead of
    "re-read the snapshot"). Pin both statuses: an
    IncompleteChangeLog with NO recognizable wording answers 410; a
    plain ValueError CONTAINING the historical match text answers
    404."""
    import threading

    from local_vectordb_spark.api import IncompleteChangeLog
    from local_vectordb_spark.serving import make_server

    db = VectorDB(spark, str(tmp_path / "typed_db"))
    srv = make_server(db)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # the table must have a live generation: a never-written table
        # is answered from the route's own single pointer read (r14
        # ADVICE) and would never reach the patched table_changes
        assert _req(base, "POST", "/libraries", {"name": "g"})[0] == 201

        def _raise(exc):
            def fn(*a, **k):
                raise exc
            return fn

        monkeypatch.setattr(
            db, "table_changes",
            _raise(IncompleteChangeLog("reworded: delta log has a gap")),
        )
        code, body = _req(base, "GET", "/libraries/_changes?since=0")
        assert code == 410 and "gap" in body["detail"]

        monkeypatch.setattr(
            db, "table_changes",
            _raise(ValueError("bad version (note: no change record)")),
        )
        code, _ = _req(base, "GET", "/libraries/_changes?since=0")
        assert code == 404
    finally:
        srv.shutdown()


def _req_headers(base, path):
    req = urllib.request.Request(base + path, method="GET")
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read()), dict(resp.headers)


def test_changes_route_is_paginated(spark, tmp_path):
    """r13 verdict #7: the feed response is bounded — one ordered page
    of at most ``limit`` changes per request, X-More-Changes signalling
    continuation, the page cut from the generation pinned by
    X-Table-Version (an immutable range, so offset pagination cannot
    tear across commits). Own server with keep_versions=8: the feed
    spans five commits, and every commit in the range must still hold
    its delta record (the module server's default retention of 2 would
    GC them — correctly answering 410, which the broken-log test
    covers)."""
    import threading

    from local_vectordb_spark.serving import make_server

    db = VectorDB(spark, str(tmp_path / "page_db"), keep_versions=8)
    srv = make_server(db)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    server = f"http://127.0.0.1:{srv.server_address[1]}"
    _, lib = _req(server, "POST", "/libraries", {"name": "pg"})
    _, doc = _req(
        server, "POST", "/documents", {"name": "d", "library_id": lib["id"]}
    )
    # first chunk = the table's initial load (records no delta): the
    # feed base. Five more commits, each recording one upsert.
    assert _req(
        server, "POST", "/chunks", {"content": "base row", "document_id": doc["id"]}
    )[0] == 201
    _, _, h = _req_headers(server, "/chunks?limit=1")
    base_v = int(h["X-Table-Version"])
    ids = []
    for i in range(5):
        _, ch = _req(
            server, "POST", "/chunks",
            {"content": f"row {i}", "document_id": doc["id"]},
        )
        ids.append(ch["id"])

    # page through the 5-upsert feed two at a time, pinned to the
    # generation the first page named
    code, p1, h1 = _req_headers(server, f"/chunks/_changes?since={base_v}&limit=2")
    assert code == 200 and len(p1) == 2 and h1["X-More-Changes"] == "true"
    pin = int(h1["X-Table-Version"])
    code, p2, h2 = _req_headers(
        server,
        f"/chunks/_changes?since={base_v}&version={pin}&limit=2&offset=2",
    )
    assert code == 200 and len(p2) == 2 and h2["X-More-Changes"] == "true"
    code, p3, h3 = _req_headers(
        server,
        f"/chunks/_changes?since={base_v}&version={pin}&limit=2&offset=4",
    )
    assert code == 200 and len(p3) == 1 and h3["X-More-Changes"] == "false"
    got = [(r["change_type"], r["id"]) for r in p1 + p2 + p3]
    assert got == sorted(("upsert", i) for i in ids)  # ordered, complete
    # default limit (100) swallows the whole 5-row feed in one page
    _, full, hf = _req_headers(server, f"/chunks/_changes?since={base_v}")
    assert len(full) == 5 and hf["X-More-Changes"] == "false"
    srv.shutdown()


def test_changes_on_never_written_table_is_one_pointer_read(spark, tmp_path):
    """r14 ADVICE: a never-written table's feed must answer from the
    SAME pointer read that produced X-Table-Version — previously the
    route passed version=None and let table_changes re-read _CURRENT,
    so a commit landing between the two reads made the header (-1)
    name an older generation than the feed covered, and the client's
    next since=-1 poll re-received rows. The pinned contract: since=-1
    on an empty table is an empty 200 page (header -1, no more pages);
    any newer base never existed — 404, mirroring table_changes'
    own range check."""
    import threading

    from local_vectordb_spark.serving import make_server

    db = VectorDB(spark, str(tmp_path / "empty_db"))
    srv = make_server(db)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    server = f"http://127.0.0.1:{srv.server_address[1]}"
    code, body, h = _req_headers(server, "/chunks/_changes?since=-1")
    assert code == 200 and body == []
    assert int(h["X-Table-Version"]) == -1
    assert h["X-More-Changes"] == "false"
    # a base generation that never existed on this table
    assert _req(server, "GET", "/chunks/_changes?since=0")[0] == 404
    assert _req(server, "GET", "/chunks/_changes?since=-2")[0] == 404
    srv.shutdown()


def test_changes_pagination_does_not_tear_across_concurrent_commit(
    spark, tmp_path
):
    """The immutable-range claim under an actual interleaved write
    (r15): a commit landing BETWEEN two pages of one poll must not
    tear the feed — continuation pages passing version=<pin> keep
    reading the generation the first page named, the new commit's row
    appears in none of them, and a FRESH poll from the same base then
    covers it under a newer pin. This is the race the X-Table-Version
    pin exists to close; the pagination test covers the happy path,
    this pins the interleaving."""
    import threading

    from local_vectordb_spark.serving import make_server

    db = VectorDB(spark, str(tmp_path / "tear_db"), keep_versions=10)
    srv = make_server(db)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    server = f"http://127.0.0.1:{srv.server_address[1]}"
    _, lib = _req(server, "POST", "/libraries", {"name": "t"})
    _, doc = _req(
        server, "POST", "/documents", {"name": "d", "library_id": lib["id"]}
    )
    assert _req(server, "POST", "/chunks",
                {"content": "base", "document_id": doc["id"]})[0] == 201
    _, _, h = _req_headers(server, "/chunks?limit=1")
    base_v = int(h["X-Table-Version"])
    ids = [
        _req(server, "POST", "/chunks",
             {"content": f"row {i}", "document_id": doc["id"]})[1]["id"]
        for i in range(3)
    ]

    # page 1 pins the 3-upsert generation
    code, p1, h1 = _req_headers(
        server, f"/chunks/_changes?since={base_v}&limit=2")
    assert code == 200 and len(p1) == 2 and h1["X-More-Changes"] == "true"
    pin = int(h1["X-Table-Version"])

    # a commit lands BETWEEN the pages
    _, late = _req(server, "POST", "/chunks",
                   {"content": "late", "document_id": doc["id"]})

    # page 2 must complete the PINNED range: exactly the third row,
    # no late row, no more pages
    code, p2, h2 = _req_headers(
        server,
        f"/chunks/_changes?since={base_v}&version={pin}&limit=2&offset=2",
    )
    assert code == 200 and h2["X-More-Changes"] == "false"
    got = [(r["change_type"], r["id"]) for r in p1 + p2]
    assert got == sorted(("upsert", i) for i in ids)
    assert all(r["id"] != late["id"] for r in p1 + p2)

    # the NEXT poll (fresh pin) picks up exactly what the torn-away
    # commit added — nothing lost, nothing duplicated
    code, p3, h3 = _req_headers(server, f"/chunks/_changes?since={pin}")
    assert code == 200 and int(h3["X-Table-Version"]) > pin
    assert [(r["change_type"], r["id"]) for r in p3] == [
        ("upsert", late["id"])
    ]
    srv.shutdown()


def test_timestamp_wire_format_is_offset_aware_utc():
    """r15 ADVICE (low): the wire format must carry an explicit UTC
    offset, not a naive session-local string a consumer re-interprets
    in ITS session zone. Round trip: a naive collect() value in a
    non-UTC session zone serializes shifted to +00:00, and the
    consumer's _parse_row lands on the identical instant as aware
    UTC — producer and consumer no longer need to share
    spark.sql.session.timeZone."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from local_vectordb_spark.serving import _row_to_json
    from local_vectordb_spark.streaming.cdf import _parse_row

    naive = dt.datetime(2025, 1, 15, 12, 0, 0)  # session-local wall time
    out = _row_to_json(Row(id="x", created_at=naive),
                       ZoneInfo("America/New_York"))
    assert out["created_at"] == "2025-01-15T17:00:00+00:00"  # EST = UTC-5

    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ])
    parsed = dict(zip(["id", "created_at"], _parse_row(out, schema)))
    assert parsed["created_at"] == dt.datetime(
        2025, 1, 15, 17, 0, 0, tzinfo=dt.timezone.utc
    )
    # the instant is preserved exactly across the JSON boundary
    assert parsed["created_at"] == naive.replace(
        tzinfo=ZoneInfo("America/New_York")
    ).astimezone(dt.timezone.utc)


def test_data_reads_echo_timeline_id(server):
    """Every data read carries X-Timeline-Id beside X-Table-Version
    (r15 ADVICE, medium): the uuid is stable across requests and
    routes — it identifies the STORE, not the response."""
    base = server
    with urllib.request.urlopen(
        urllib.request.Request(base + "/chunks?limit=1", method="GET")
    ) as resp:
        head = int(resp.headers["X-Table-Version"])
        list_tid = resp.headers.get("X-Timeline-Id")
    # since=<live head> is in-range whatever state earlier tests left
    # the shared store in (head itself needs no delta record)
    with urllib.request.urlopen(
        urllib.request.Request(
            base + f"/chunks/_changes?since={head}&limit=1", method="GET"
        )
    ) as resp:
        feed_tid = resp.headers.get("X-Timeline-Id")
    assert list_tid and list_tid == feed_tid  # one store, one id


def test_bundle_serves_over_http(spark, tmp_path):
    """The deployment loop closed over the wire: a store is seeded,
    exported as a serving bundle, the bundle is opened on its own and
    bound to a fresh HTTP server — and POST /query against the BUNDLE
    server returns exactly what the source server returns, for the
    brute and the stored-artifact strategies alike. This is the shape
    serving.py's docstring promises (serve search from an exported
    index): the Spark driver behind the bundle server never touches
    the source store."""
    import threading
    import uuid as _uuid

    from local_vectordb_spark.api import open_serving_bundle
    from local_vectordb_spark.sources.json_records import SCHEMAS

    src = VectorDB(spark, str(tmp_path / "src"))
    lib = str(_uuid.uuid4())
    src.add("libraries",
            spark.createDataFrame([(lib, {}, None, None, "l")],
                                  SCHEMAS["libraries"]))
    doc = str(_uuid.uuid4())
    src.add("documents",
            spark.createDataFrame([(doc, {}, None, None, "d", lib)],
                                  SCHEMAS["documents"]))
    src.add("chunks", spark.createDataFrame(
        [(f"c{i}", {}, None, None, q, None, doc)
         for i, q in enumerate(QUESTIONS)],
        SCHEMAS["chunks"],
    ))
    bundle_dir = str(tmp_path / "bundle")
    src.export_serving_bundle(bundle_dir, recall_queries=1, recall_k=3)
    bdb = open_serving_bundle(spark, bundle_dir, verify_checksums=True)

    servers = []
    for d in (src, bdb):
        srv = make_server(d)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append((srv, f"http://127.0.0.1:{srv.server_address[1]}"))
    (src_srv, src_base), (b_srv, b_base) = servers
    try:
        for strategy in ("cosine", "sign", "sq8", "nsw"):
            body = {"text": QUESTIONS[0], "index_type": strategy, "limit": 3}
            code_a, res_a = _req(src_base, "POST", "/query", body)
            code_b, res_b = _req(b_base, "POST", "/query", body)
            assert code_a == code_b == 200, strategy
            assert res_a == res_b, strategy
            assert res_b["results"][0]["content"] == QUESTIONS[0]
    finally:
        src_srv.shutdown()
        b_srv.shutdown()


def test_session_tz_accepts_all_spark_offset_spellings():
    """r16 ADVICE (medium): Spark documents '(+|-)HH', '(+|-)HH:mm:ss',
    and 'UTC+8'/'GMT+05:00'-style values for spark.sql.session.timeZone
    beside region ids and '(+|-)HH:MM'. The serializer's tz resolver
    must accept them all — a rejected spelling 500s every data read."""
    import datetime as dt

    from local_vectordb_spark.serving import _session_tz

    class _Conf:
        def __init__(self, name):
            self._n = name

        def get(self, _key):
            return self._n

    class _Spark:
        def __init__(self, name):
            self.conf = _Conf(name)

    def off(name):
        return _session_tz(_Spark(name)).utcoffset(None)

    assert off("+08") == dt.timedelta(hours=8)
    assert off("-5") == -dt.timedelta(hours=5)
    assert off("+05:30") == dt.timedelta(hours=5, minutes=30)
    assert off("-08:00:30") == -dt.timedelta(hours=8, seconds=30)
    assert off("UTC+8") == dt.timedelta(hours=8)
    assert off("GMT+05:00") == dt.timedelta(hours=5)
    assert off("UTC-10:30") == -dt.timedelta(hours=10, minutes=30)
    # region ids still resolve through zoneinfo, and garbage still
    # raises loudly rather than silently defaulting
    assert _session_tz(_Spark("UTC")).utcoffset(None) == dt.timedelta(0)
    with pytest.raises(ValueError, match="unsupported"):
        _session_tz(_Spark("not-a-zone"))


def test_multi_table_bundle_serves_sibling_reads_over_http(spark,
                                                           tmp_path):
    """r17 verdict #6 over the wire: a bundle exported with
    siblings=True, bound to its own HTTP server, answers the
    documents/libraries GET routes (point and list) exactly like the
    live store's server — the offline replica is a full read API, not
    just a search endpoint."""
    import threading
    import uuid as _uuid

    from local_vectordb_spark.api import open_serving_bundle
    from local_vectordb_spark.sources.json_records import SCHEMAS

    src = VectorDB(spark, str(tmp_path / "src"))
    lib = str(_uuid.uuid4())
    src.add("libraries",
            spark.createDataFrame([(lib, {}, None, None, "l")],
                                  SCHEMAS["libraries"]))
    doc = str(_uuid.uuid4())
    src.add("documents",
            spark.createDataFrame([(doc, {}, None, None, "d", lib)],
                                  SCHEMAS["documents"]))
    src.add("chunks", spark.createDataFrame(
        [(f"c{i}", {}, None, None, q, None, doc)
         for i, q in enumerate(QUESTIONS[:4])],
        SCHEMAS["chunks"],
    ))
    bundle_dir = str(tmp_path / "mt_bundle")
    src.export_serving_bundle(bundle_dir, recall_queries=1, recall_k=3,
                              siblings=True)
    bdb = open_serving_bundle(spark, bundle_dir, verify_checksums=True)

    servers = []
    for d in (src, bdb):
        srv = make_server(d)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append((srv, f"http://127.0.0.1:{srv.server_address[1]}"))
    (src_srv, src_base), (b_srv, b_base) = servers
    try:
        for route in (f"/documents/{doc}", f"/libraries/{lib}",
                      "/documents", "/libraries"):
            code_a, res_a = _req(src_base, "GET", route)
            code_b, res_b = _req(b_base, "GET", route)
            assert code_a == code_b == 200, route
            assert res_a == res_b, route
        # point reads carry the right payloads
        code, d_doc = _req(b_base, "GET", f"/documents/{doc}")
        assert code == 200 and d_doc["name"] == "d"
        assert d_doc["library_id"] == lib
    finally:
        src_srv.shutdown()
        b_srv.shutdown()
