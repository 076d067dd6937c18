"""STAC-over-HTTP catalog source against a live localhost server,
wired end-to-end into Engine.find_layers."""

import http.server
import json
import socketserver
import threading


def _serve_pages(pages: dict):
    """Serve path -> JSON documents."""

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = json.dumps(pages[self.path]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = socketserver.TCPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def _item(iid, bbox, when):
    return {"type": "Feature", "id": iid, "bbox": bbox,
            "geometry": None, "properties": {"datetime": when}}


def test_stac_items_paged_fetch_and_query(spark):
    from geotrellis_server_spark.engine import Engine
    from geotrellis_server_spark.query import ast as Q
    from geotrellis_server_spark.sources.stac_http import load_stac_items

    pages = {
        "/search": {
            "type": "FeatureCollection",
            "features": [
                _item("scene-a", [0.0, 0.0, 2.0, 2.0],
                      "2020-01-01T00:00:01Z"),
                _item("scene-b", [1.0, 1.0, 4.0, 4.0],
                      "2020-02-01T00:00:01Z"),
            ],
            "links": [{"rel": "next", "href": "PLACEHOLDER"}],
        },
        "/search?page=2": {
            "type": "FeatureCollection",
            "features": [
                _item("scene-c", [6.0, 6.0, 10.0, 10.0],
                      "2020-03-01T00:00:01Z"),
                {"type": "Feature", "id": "no-bbox", "properties": {}},
            ],
            "links": [],
        },
    }
    srv, port = _serve_pages(pages)
    base = f"http://127.0.0.1:{port}"
    pages["/search"]["links"][0]["href"] = f"{base}/search?page=2"
    try:
        cat = load_stac_items(spark, f"{base}/search")
        rows = {r.name: r for r in cat.collect()}
        assert set(rows) == {"scene-a", "scene-b", "scene-c"}  # paged +
        # bbox-less items dropped
        assert rows["scene-c"].xmax == 10.0
        assert rows["scene-a"].times[0].month == 1
        # end-to-end: the fetched catalog answers spatial queries
        eng = Engine(spark, {}, catalog=cat)
        got = set(eng.find_layers(Q.intersects((0.5, 0.5, 1.5, 1.5))))
        assert got == {"scene-a", "scene-b"}
    finally:
        srv.shutdown()
