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


def make_rest_server(root: str, host: str = "127.0.0.1", port: int = 0):
    """HTTP server for an assembled REST tree (the service the reference's
    folder layout is built FOR: the FlatMatch WebGL viewer fetches
    `rest/get/{offer,layout,textures}/<id>`, generate_flatmatch_entry.py:54-82
    and the worker fetch in /root/reference/main.js). Returns a configured
    `ThreadingHTTPServer`; call `.serve_forever()` (or run it from a thread
    in tests). `root` is the directory CONTAINING `rest/`."""
    import http.server

    base = pathlib.Path(root).resolve()

    class Handler(http.server.BaseHTTPRequestHandler):
        CONTENT_TYPES = {
            "offer": "application/json",
            "textures": "application/json",
            "layout": "image/png",
        }

        def do_GET(self):  # noqa: N802 (http.server API)
            parts = [p for p in self.path.split("?")[0].split("/") if p]
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
            body = f.read_bytes()
            self.send_response(200)
            self.send_header("Content-Type", self.CONTENT_TYPES[parts[2]])
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet: progress goes through our tracer
            pass

    return http.server.ThreadingHTTPServer((host, port), Handler)
