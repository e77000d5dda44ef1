"""HTTP service: the REST surface of the engine (L6 parity).

Routes mirror the reference's user-facing API shape:
  GET  /_plugins/_knn/stats[/{stat}]      node stats
       (+ legacy /_opendistro/_knn/stats alias — RestKNNStatsHandler.java:
       56-64, JVectorKNNPlugin.java:128-129)
  PUT  /{index}                           create index (knn_vector mapping)
  POST /{index}/_doc/{id}                 index one document
  POST /{index}/_bulk                     [{"_id": ..., field: [...]}, ...]
  POST /{index}/_flush                    flush buffered docs to a segment
  POST /{index}/_forcemerge               merge all segments
  POST /{index}/_search                   {"query": {"knn": {field: {...}}},
                                           "size": N, "ext": {"mmr": {...}}}
  DELETE /{index}/_doc/{id}               tombstone a document
  GET  /{index}/_count                    live doc count

This is a thin control plane: all heavy work stays in the index layer.
Stdlib-only (no external web framework in the image).
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from opensearch_jvector_tpu.api.config import SearchConfig, ValidationError
from opensearch_jvector_tpu.api.mapping import parse_knn_vector_mapping
from opensearch_jvector_tpu.api.stats import STATS
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.query import knn as knn_mod
from opensearch_jvector_tpu.query import mmr as mmr_mod
from opensearch_jvector_tpu.query.builder import parse_knn_query


class IndexManager:
    """Registry of named indices (one knn_vector field each, v1)."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()
        self._indices: dict[str, tuple[VectorIndex, str]] = {}

    def create(self, name: str, mappings: dict) -> dict:
        props = (mappings or {}).get("properties") or {}
        knn_fields = [
            (f, m) for f, m in props.items()
            if isinstance(m, dict) and m.get("type") == "knn_vector"
        ]
        if len(knn_fields) != 1:
            raise ValidationError(
                "exactly one knn_vector field per index is supported"
            )
        field, fmap = knn_fields[0]
        config, extras = parse_knn_vector_mapping(fmap)
        with self._lock:
            if name in self._indices:
                raise ValidationError(f"index {name} already exists")
            idx = VectorIndex(self.root / name, config)
            self._indices[name] = (idx, field)
        return {"acknowledged": True, "index": name, "field": field,
                "mode": extras["mode"]}

    def get(self, name: str) -> tuple[VectorIndex, str]:
        with self._lock:
            if name not in self._indices:
                raise KeyError(name)
            return self._indices[name]


def _make_handler(mgr: IndexManager):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # silence stderr noise
            pass

        def _send(self, code: int, body: dict):
            raw = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            if n == 0:
                return {}
            return json.loads(self.rfile.read(n))

        def _error(self, code: int, msg: str):
            self._send(code, {"error": msg, "status": code})

        # -- routing -------------------------------------------------------

        def do_GET(self):
            try:
                m = re.fullmatch(
                    r"/(?:_plugins|_opendistro)/_knn/stats(?:/([\w,]+))?",
                    self.path,
                )
                if m:
                    snap = STATS.snapshot()
                    if m.group(1):
                        keys = m.group(1).split(",")
                        missing = [k for k in keys if k not in snap]
                        if missing:
                            return self._error(400, f"unknown stats {missing}")
                        snap = {k: snap[k] for k in keys}
                    return self._send(200, {"nodes": {"local": snap}})
                m = re.fullmatch(r"/([\w.-]+)/_count", self.path)
                if m:
                    idx, _ = mgr.get(m.group(1))
                    return self._send(200, {"count": idx.doc_count()})
                self._error(404, f"no route for GET {self.path}")
            except KeyError as e:
                self._error(404, f"no such index {e}")
            except Exception as e:  # noqa: BLE001 — service boundary
                self._error(500, str(e))

        def do_PUT(self):
            try:
                m = re.fullmatch(r"/([\w.-]+)", self.path)
                if not m:
                    return self._error(404, f"no route for PUT {self.path}")
                body = self._body()
                out = mgr.create(m.group(1), body.get("mappings") or {})
                self._send(200, out)
            except ValidationError as e:
                self._error(400, str(e))
            except Exception as e:  # noqa: BLE001
                self._error(500, str(e))

        def do_DELETE(self):
            try:
                m = re.fullmatch(r"/([\w.-]+)/_doc/(\d+)", self.path)
                if not m:
                    return self._error(404, f"no route for DELETE {self.path}")
                idx, _ = mgr.get(m.group(1))
                idx.delete(int(m.group(2)))
                self._send(200, {"result": "deleted"})
            except KeyError as e:
                self._error(404, f"no such index {e}")
            except Exception as e:  # noqa: BLE001
                self._error(500, str(e))

        def do_POST(self):
            try:
                path = self.path
                if m := re.fullmatch(r"/([\w.-]+)/_doc/(\d+)", path):
                    idx, field = mgr.get(m.group(1))
                    body = self._body()
                    if field not in body:
                        return self._error(400, f"missing field {field}")
                    idx.add(int(m.group(2)), np.asarray(body[field], np.float32))
                    return self._send(201, {"result": "created"})
                if m := re.fullmatch(r"/([\w.-]+)/_bulk", path):
                    idx, field = mgr.get(m.group(1))
                    docs = self._body().get("docs") or []
                    for doc in docs:
                        idx.add(int(doc["_id"]),
                                np.asarray(doc[field], np.float32))
                    return self._send(200, {"indexed": len(docs)})
                if m := re.fullmatch(r"/([\w.-]+)/_flush", path):
                    idx, _ = mgr.get(m.group(1))
                    seg = idx.flush()
                    return self._send(200, {"segment": seg})
                if m := re.fullmatch(r"/([\w.-]+)/_forcemerge", path):
                    idx, _ = mgr.get(m.group(1))
                    seg = idx.force_merge()
                    return self._send(200, {"segment": seg})
                if m := re.fullmatch(r"/([\w.-]+)/_search", path):
                    return self._search(m.group(1))
                self._error(404, f"no route for POST {path}")
            except ValidationError as e:
                self._error(400, str(e))
            except KeyError as e:
                self._error(404, f"no such index {e}")
            except Exception as e:  # noqa: BLE001
                self._error(500, str(e))

        def _search(self, index_name: str):
            idx, field = mgr.get(index_name)
            body = self._body()
            size = int(body.get("size", 10))
            qbody = body.get("query") or {}

            # painless-style script_score (knn_score engine parity):
            # {"script_score": {"script": {"source": "knn_score",
            #   "lang": "knn", "params": {field, query_value, space_type}}}}
            if "script_score" in qbody:
                script = (qbody["script_score"] or {}).get("script") or {}
                if script.get("source") != "knn_score" or (
                    script.get("lang", "knn") != "knn"
                ):
                    return self._error(
                        400, "only the knn_score script is allowlisted"
                    )
                p = script.get("params") or {}
                if p.get("field", field) != field:
                    return self._error(400, f"unknown field {p.get('field')}")
                res = knn_mod.execute_script_score(
                    idx, p.get("space_type", "l2"), p["query_value"], k=size,
                )
                hits = [
                    {"_id": int(d), "_score": float(s)}
                    for d, s in zip(res.doc_ids[0], res.scores[0]) if d >= 0
                ]
                return self._send(200, {
                    "hits": {"total": {"value": len(hits)}, "hits": hits},
                })

            qroot = qbody.get("knn") or {}
            if field not in qroot:
                # ignore_unmapped parity: an unmapped target field returns
                # empty hits instead of an error when the flag is set
                tgt = next(iter(qroot), None)
                if tgt is not None and bool(
                    (qroot[tgt] or {}).get("ignore_unmapped", False)
                ):
                    return self._send(200, {
                        "hits": {"total": {"value": 0}, "hits": []},
                    })
                return self._error(400, f"knn query must target field {field}")
            query = parse_knn_query(qroot[field])

            ext = body.get("ext") or {}
            if "mmr" in ext:
                mmr_body = ext["mmr"] or {}
                params = mmr_mod.MMRParams(
                    diversity=float(mmr_body.get("diversity", 0.5)),
                    candidates=mmr_body.get("candidates"),
                )
                res = mmr_mod.mmr_search(
                    idx, query.vector, size, params,
                    SearchConfig(
                        k=max(query.k or size, size),
                        ef_search=query.ef_search,
                        overquery_factor=query.overquery_factor,
                    ),
                )
            else:
                res = knn_mod.execute_knn_query(idx, query)

            def hits_for(row_ids, row_scores):
                hits = []
                for doc, score in zip(row_ids, row_scores):
                    if doc < 0:
                        continue
                    hits.append({"_id": int(doc), "_score": float(score)})
                    if len(hits) >= size:
                        break
                return hits

            profile = {
                "visited": res.visited,
                "expanded": res.expanded,
                "reranked": res.reranked,
            }
            if np.asarray(query.vector).ndim == 2:
                # batched query surface (msearch-style): Q query vectors ran
                # as ONE device dispatch; one response per vector
                responses = [
                    {"hits": {"total": {"value": len(h)}, "hits": h}}
                    for h in (
                        hits_for(res.doc_ids[i], res.scores[i])
                        for i in range(res.doc_ids.shape[0])
                    )
                ]
                return self._send(200, {
                    "responses": responses, "profile": profile,
                })
            hits = hits_for(res.doc_ids[0], res.scores[0])
            return self._send(200, {
                "hits": {"total": {"value": len(hits)}, "hits": hits},
                "profile": profile,
            })

    return Handler


class KnnService:
    """Embedded HTTP service wrapper (threaded; test- and prod-friendly)."""

    def __init__(self, root: str | Path, host: str = "127.0.0.1",
                 port: int = 0):
        self.manager = IndexManager(root)
        self.server = ThreadingHTTPServer(
            (host, port), _make_handler(self.manager)
        )
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.server.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self.server.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
