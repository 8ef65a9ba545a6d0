"""FlatMatch REST folder-tree packager.

TPU-native equivalent of the outer CLI driver
(/root/reference/generate_flatmatch_entry.py): run the renderer, splice the
collision map / geometry / georeference args into the offer template, and lay
out `rest/get/{offer,layout,textures}/<id>` with base64 tile PNGs for the
FlatMatch WebGL viewer. The renderer is called in-process instead of via
subprocess (generate_flatmatch_entry.py:37-38) — there is no separate binary.
"""
from __future__ import annotations

import base64
import json
import pathlib
import shutil
from typing import Optional

from ..config import RenderConfig
from ..render import render

# Offer skeleton: the exact contents of the reference's offer_template.json
# (a data contract, including its static demo-listing fields), so an
# assembled `rest/get/offer/<id>` is byte-identical to a reference-generated
# one. $-placeholders are spliced textually so `collisionMap` and `layout`
# keep the renderer's exact JSON bytes (generate_flatmatch_entry.py:40-51).
OFFER_TEMPLATE = """{
    "rowid": $ROW_ID,
    "landlordOfferId": "9214.025",
    "landlord": "WOBAU",
    "collisionMap": $COLLISION_MAP,
    "numRooms": 3,
    "lon": $LONGITUDE,
    "detailsUrl": "mieten_WhgDetails.asp?ObjID=41971",
    "area": 67.0,
    "layoutId": $ROW_ID,
    "level": $LEVEL,
    "lat": $LATITUDE,
    "layout": $LAYOUT,
    "hasBalcony": 1,
    "rent": 512.82,
    "scale": $SCALE,
    "address": "Apollostr. 5",
    "yaw": $YAW
}
"""


def package_offer(
    source_image: str,
    offer_id: int,
    scale: float,
    latitude: float,
    longitude: float,
    yaw: float,
    level: int,
    out_dir: str = ".",
    cfg: Optional[RenderConfig] = None,
    template: Optional[str] = None,
    mesh="auto",
    checkpoint_path: Optional[str] = None,
) -> Optional[pathlib.Path]:
    """Render and assemble the REST tree; returns the `rest/` root path.

    Multi-host: non-primary processes participate in the render collectives
    but write nothing and return None."""
    from ..parallel import multihost

    out = pathlib.Path(out_dir)
    tiles_dir = out / "tiles"
    if multihost.is_primary() and tiles_dir.exists():
        shutil.rmtree(tiles_dir)

    result = render(source_image, str(out), scale, cfg, mesh=mesh,
                    checkpoint_path=checkpoint_path)
    if not multihost.is_primary():
        return None

    tpl = template if template is not None else OFFER_TEMPLATE
    tpl = tpl.replace("$COLLISION_MAP", result.collision_json)
    tpl = tpl.replace("$LONGITUDE", str(longitude))
    tpl = tpl.replace("$LATITUDE", str(latitude))
    tpl = tpl.replace("$LEVEL", str(level))
    tpl = tpl.replace("$SCALE", str(scale))
    tpl = tpl.replace("$YAW", str(yaw))
    tpl = tpl.replace("$LAYOUT", result.geometry_json)
    tpl = tpl.replace("$ROW_ID", str(offer_id))

    rest = out / "rest" / "get"
    (rest / "offer").mkdir(parents=True, exist_ok=True)
    (rest / "layout").mkdir(parents=True, exist_ok=True)
    (rest / "textures").mkdir(parents=True, exist_ok=True)

    (rest / "offer" / str(offer_id)).write_text(tpl)
    (rest / "layout" / str(offer_id)).write_bytes(
        pathlib.Path(source_image).read_bytes()
    )
    textures = {
        str(i): base64.b64encode(p.read_bytes()).decode("ascii")
        for i, p in enumerate(result.tile_paths)
    }
    (rest / "textures" / str(offer_id)).write_text(json.dumps(textures))
    return out / "rest"


# Minimal browser frontend served at "/": the functional analog of the
# reference's in-repo demo page (/root/reference/main.js), which appends
# each lightmap as a small <img> tile (main.js:12-17). The stale
# emscripten worker pipeline is replaced by the REST tree this server
# already publishes: the page fetches offer/layout/textures for an id and
# shows the layout, the geometry summary, and the full tile gallery.
_VIEWER_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>flatmatch_tpu viewer</title>
<style>
 body { font-family: sans-serif; margin: 1.5em; background: #161616;
        color: #ddd; }
 img.tile { width: 32px; height: 32px; image-rendering: pixelated;
            margin: 1px; background: #000; }
 img.layout { border: 1px solid #555; max-width: 40em; }
 code { color: #9c9; }
</style></head><body>
<h2>flatmatch_tpu lightmap viewer</h2>
<p>offers: <span id="offers"></span></p>
<div id="view"></div>
<script>
"use strict";
async function show(id) {
  const view = document.getElementById("view");
  view.innerHTML = "<h3>offer " + id + "</h3>";
  const offer = await (await fetch("rest/get/offer/" + id)).json();
  const geo = offer.layout.geometry || [];
  const p = document.createElement("p");
  p.innerHTML = "<code>" + geo.length + " rects, start ["
    + (offer.layout.startingPosition || []) + "]</code>";
  view.appendChild(p);
  const img = document.createElement("img");
  img.className = "layout"; img.src = "rest/get/layout/" + id;
  view.appendChild(img);
  const tex = await (await fetch("rest/get/textures/" + id)).json();
  const gallery = document.createElement("div");
  view.appendChild(gallery);
  for (const k of Object.keys(tex)) {       // main.js:12-17 behavior
    const t = document.createElement("img");
    t.className = "tile"; t.title = "tile " + k;
    t.src = "data:image/png;base64," + tex[k];
    gallery.appendChild(t);
  }
}
(async () => {
  const ids = await (await fetch("offers")).json();
  document.getElementById("offers").innerHTML = ids.map(
    i => '<a href="#" onclick="show(' + i + ');return false">' + i + "</a>"
  ).join(" ");
  if (ids.length) show(ids[0]);
})();
</script></body></html>
"""


def make_rest_server(root: str, host: str = "127.0.0.1", port: int = 0):
    """HTTP server for an assembled REST tree (the service the reference's
    folder layout is built FOR: the FlatMatch WebGL viewer fetches
    `rest/get/{offer,layout,textures}/<id>`, generate_flatmatch_entry.py:54-82
    and the worker fetch in /root/reference/main.js). Also serves a built-in
    viewer page at `/` and the offer-id listing at `/offers`. Returns a
    configured `ThreadingHTTPServer`; call `.serve_forever()` (or run it
    from a thread in tests). `root` is the directory CONTAINING `rest/`."""
    import http.server

    base = pathlib.Path(root).resolve()

    class Handler(http.server.BaseHTTPRequestHandler):
        CONTENT_TYPES = {
            "offer": "application/json",
            "textures": "application/json",
            "layout": "image/png",
        }

        def _send(self, body: bytes, ctype: str):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            if not parts or parts == ["viewer"]:
                self._send(_VIEWER_HTML.encode(), "text/html; charset=utf-8")
                return
            if parts == ["offers"]:
                ids = sorted(
                    int(p.name)
                    for p in (base / "rest" / "get" / "offer").glob("*")
                    if p.name.isdigit()
                )
                self._send(json.dumps(ids).encode(), "application/json")
                return
            if (
                len(parts) != 4
                or parts[0] != "rest"
                or parts[1] != "get"
                or parts[2] not in self.CONTENT_TYPES
                or not parts[3].isdigit()  # ids are integers; no traversal
            ):
                self.send_error(404)
                return
            f = base / "rest" / "get" / parts[2] / parts[3]
            if not f.is_file():
                self.send_error(404)
                return
            self._send(f.read_bytes(), self.CONTENT_TYPES[parts[2]])

        def log_message(self, *a):  # quiet: progress goes through our tracer
            pass

    return http.server.ThreadingHTTPServer((host, port), Handler)
