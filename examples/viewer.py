"""Interactive progressive viewer — the reference's live demo page analog
(ref: /root/reference/index.html + ui/ui.js: CodeMirror editor + rAF loop).

Serves a browser page with mouse orbit / wheel zoom / click picking driving
the same Control/Pickup machinery as the reference, while a render thread
accumulates progressive samples (camera motion resets accumulation, like
renderer.js:57-60).

    python examples/viewer.py --scene cornell_mirror --size 256
    # open http://localhost:8000
"""
import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import sail_tpu as sail
from sail_tpu import scenes
from sail_tpu.render.control import Control
from sail_tpu.utils.imageio import png_bytes

PAGE = """<!doctype html><html><head><title>sail_tpu viewer</title><style>
body{background:#111;color:#ddd;font-family:monospace;text-align:center}
img{image-rendering:pixelated;width:512px;height:512px;cursor:grab}
</style></head><body>
<h3>sail_tpu — progressive path tracer</h3>
<img id=v src=/frame.png draggable=false>
<div id=s></div>
<script>
const img=document.getElementById('v'), stat=document.getElementById('s');
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY];e.preventDefault()};
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;
  fetch(`/orbit?dx=${e.clientX-drag[0]}&dy=${e.clientY-drag[1]}`);
  drag=[e.clientX,e.clientY];};
img.onwheel=e=>{fetch(`/zoom?d=${e.deltaY>0?-1:1}`);e.preventDefault()};
setInterval(async()=>{
  img.src='/frame.png?t='+Date.now();
  const j=await (await fetch('/status')).json();
  stat.textContent=`samples: ${j.samples}`;
},500);
</script></body></html>"""


class ViewerState:
    def __init__(self, scene, size):
        self.scene = scene
        self.renderer = sail.Renderer(size, size)
        self.renderer.update(scene)
        self.control = Control(scene, size, size)
        self.lock = threading.Lock()
        self.dirty = False
        self.png = None

    def render_loop(self):
        while True:
            with self.lock:
                if self.dirty:
                    self.scene.moving = True
                    self.dirty = False
            self.renderer.render(self.scene)
            self.scene.moving = False
            if self.renderer.sample_count % 4 == 1 or self.renderer.sample_count < 4:
                img = self.renderer.output(self.scene)
                self.png = png_bytes(img)


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            if url.path == "/":
                self._send(200, "text/html", PAGE.encode())
            elif url.path == "/frame.png":
                body = state.png or b""
                self._send(200, "image/png", body)
            elif url.path == "/status":
                self._send(200, "application/json", json.dumps(
                    {"samples": state.renderer.sample_count}).encode())
            elif url.path == "/orbit":
                with state.lock:
                    state.control.orbit(float(q.get("dx", 0)),
                                        float(q.get("dy", 0)))
                    state.dirty = True
                self._send(200, "text/plain", b"ok")
            elif url.path == "/zoom":
                with state.lock:
                    state.control.zoom(float(q.get("d", 0)))
                    state.dirty = True
                self._send(200, "text/plain", b"ok")
            else:
                self._send(404, "text/plain", b"not found")
    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_mirror")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    scene = getattr(scenes, args.scene)()
    scene.filter = "gamma"
    state = ViewerState(scene, args.size)
    threading.Thread(target=state.render_loop, daemon=True).start()
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"viewer on http://localhost:{args.port} ({args.scene}, "
          f"{args.size}x{args.size})")
    server.serve_forever()


if __name__ == "__main__":
    main()
