"""Browser front end: the TPU-native analogue of the reference's egui window.

Single-page app served by the Python stdlib HTTP server: a canvas streams
frames rendered on device; a control panel exposes every live control of the
reference UI (``src/bin/main.rs:250-404``) — particle count, world size,
update rate, walls, effect radius, interaction force, drag, repulsion
threshold, gravity, per-species colors, the attraction matrix — plus
checkpoint save. WASD/QE and arrow keys drive the camera (main.rs:208-247).

The simulation is advanced by the frame requests themselves (fixed-timestep
catch-up in ``SimulationApp.tick``), exactly like the reference's
render-driven loop.

Run: ``python -m particle3d_tpu.app.server [--preset reference] [--port 8000]``
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

import numpy as np

from .driver import SimulationApp

_PAGE = """<!doctype html>
<html><head><title>particle3d-tpu</title><style>
body{margin:0;background:#101014;color:#ccc;font:13px monospace;display:flex}
#panel{width:330px;padding:10px;overflow-y:auto;height:100vh;box-sizing:border-box}
#view{flex:1;display:flex;align-items:center;justify-content:center}
canvas{outline:none}
label{display:block;margin:6px 0 2px}
input[type=range]{width:180px;vertical-align:middle}
input[type=number]{width:70px;background:#222;color:#eee;border:1px solid #444}
table td{padding:1px}
.mat input{width:44px}
#metrics{white-space:pre;color:#8f8}
button{background:#333;color:#eee;border:1px solid #555;margin:4px 2px;padding:3px 8px}
</style></head><body>
<div id=panel>
  <h3>particle3d-tpu</h3>
  <div id=metrics>...</div>
  <label>Particle Count <input id=count type=number step=100></label>
  <label>Simulation Boundary <input id=world type=number step=0.5></label>
  <label>Update Rate (TPS) <input id=tps type=range min=1 max=1000 step=1><span id=tpsv></span></label>
  <label><input id=walls type=checkbox> Use Solid Walls</label>
  <label>Effect Radius <input id=radius type=range min=0.05 max=10 step=0.05><span id=radiusv></span></label>
  <label>Interaction Scale <input id=force type=range min=0 max=10 step=0.1><span id=forcev></span></label>
  <label>Drag (Friction) <input id=drag type=range min=0 max=1 step=0.01><span id=dragv></span></label>
  <label>Repulsion Threshold <input id=minpull type=range min=0 max=1 step=0.01><span id=minpullv></span></label>
  <label>Gravity x <input id=gx type=number step=0.01> y <input id=gy type=number step=0.01> z <input id=gz type=number step=0.01></label>
  <div id=species></div>
  <h4>Attraction Matrix</h4>
  <div class=mat id=matrix></div>
  <button onclick="post('checkpoint',{})">Save checkpoint</button>
  <p>keys: WASD/QE move &middot; arrows rotate (click canvas first)</p>
</div>
<div id=view><canvas id=cv width=800 height=600 tabindex=0></canvas></div>
<script>
const cv=document.getElementById('cv'),ctx=cv.getContext('2d');
let cfg=null,keys=new Set(),last=performance.now();
const KEYMAP={KeyW:'w',KeyS:'s',KeyA:'a',KeyD:'d',KeyQ:'q',KeyE:'e',
 ArrowUp:'up',ArrowDown:'down',ArrowLeft:'left',ArrowRight:'right'};
cv.addEventListener('keydown',e=>{if(KEYMAP[e.code]){keys.add(KEYMAP[e.code]);e.preventDefault()}});
cv.addEventListener('keyup',e=>{keys.delete(KEYMAP[e.code])});
async function post(name,args){await fetch('/control',{method:'POST',
 body:JSON.stringify({name:name,args:args})});}
function bindRange(id,name,fmt){const el=document.getElementById(id),
 v=document.getElementById(id+'v');
 el.oninput=()=>{v.textContent=' '+el.value;post(name,{value:parseFloat(el.value)})};}
bindRange('tps','set_update_rate');bindRange('radius','set_effect_radius');
bindRange('force','set_interaction_force');bindRange('drag','set_drag');
bindRange('minpull','set_min_pull_ratio');
count.onchange=()=>post('set_particle_count',{value:parseInt(count.value)});
world.onchange=()=>post('set_world_size',{value:parseFloat(world.value)});
walls.onchange=()=>post('set_walls',{value:walls.checked});
for(const g of ['gx','gy','gz'])document.getElementById(g).onchange=()=>
 post('set_gravity',{x:parseFloat(gx.value),y:parseFloat(gy.value),z:parseFloat(gz.value)});
function hex(rgb){return '#'+rgb.map(c=>Math.round(c*255).toString(16).padStart(2,'0')).join('')}
function buildPanel(c){
 count.value=c.n;world.value=c.world_size;tps.value=c.update_rate;
 walls.checked=c.walls;radius.value=c.particle_effect_radius;
 force.value=c.interaction_force;drag.value=c.coefficient;minpull.value=c.min_pull_ratio;
 gx.value=c.acceleration[0];gy.value=c.acceleration[1];gz.value=c.acceleration[2];
 let sp='<h4>Species Colors</h4>';
 for(let i=0;i<c.id_count;i++)sp+=`<input type=color value=${hex(c.colors[i])}
  onchange="post('set_color',{species:${i},rgb:this.value})">`;
 document.getElementById('species').innerHTML=sp;
 let m='<table>';
 for(let i=0;i<c.id_count;i++){m+='<tr>';
  for(let j=0;j<c.id_count;j++)m+=`<td><input type=number step=0.1 min=-1 max=1
   value=${c.attraction_matrix[i][j].toFixed(2)}
   onchange="post('set_attraction',{i:${i},j:${j},value:parseFloat(this.value)})"></td>`;
  m+='</tr>'}
 document.getElementById('matrix').innerHTML=m+'</table>';}
async function loadCfg(){cfg=await(await fetch('/config')).json();buildPanel(cfg)}
async function loop(){
 const now=performance.now(),dt=(now-last)/1000;last=now;
 if(keys.size)await post('keys',{keys:[...keys],dt:dt});
 const img=new Image();
 img.onload=()=>{ctx.drawImage(img,0,0);requestAnimationFrame(loop)};
 img.onerror=()=>setTimeout(loop,250);
 img.src='/frame.png?w=800&h=600&t='+now;
 const mdiv=document.getElementById('metrics');
 fetch('/metrics').then(r=>r.json()).then(m=>{
  mdiv.textContent=`FPS: ${(1/dt).toFixed(1)}\\nFrame: ${(dt*1000).toFixed(2)} ms\\n`+
   `Update: ${m.update_ms.toFixed(2)} ms\\nN: ${m.n}  step: ${m.step_index}\\n`+
   `KE: ${m.kinetic_energy.toExponential(3)}`});}
loadCfg().then(()=>loop());
</script></body></html>"""


class _Handler(BaseHTTPRequestHandler):
    app: SimulationApp = None
    lock: threading.Lock = None

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code, body, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/":
            self._send(200, _PAGE.encode(), "text/html")
        elif url.path == "/frame.png":
            q = parse_qs(url.query)
            w = int(q.get("w", ["640"])[0])
            h = int(q.get("h", ["480"])[0])
            with self.lock:
                self.app.tick()
                img = self.app.render(w, h)
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "PNG")
            self._send(200, buf.getvalue(), "image/png")
        elif url.path == "/metrics":
            with self.lock:
                m = self.app.metrics()
            self._send(200, json.dumps(m).encode())
        elif url.path == "/config":
            with self.lock:
                cfg = self.app.cfg
                out = {
                    "n": self.app.state.n,
                    "world_size": float(np.asarray(cfg.world_size)),
                    "update_rate": self.app.update_rate,
                    "walls": cfg.walls,
                    "particle_effect_radius": float(np.asarray(cfg.particle_effect_radius)),
                    "interaction_force": float(np.asarray(cfg.interaction_force)),
                    "coefficient": float(np.asarray(cfg.coefficient)),
                    "min_pull_ratio": float(np.asarray(cfg.min_pull_ratio)),
                    "acceleration": np.asarray(cfg.acceleration).tolist(),
                    "id_count": cfg.id_count,
                    "colors": np.asarray(cfg.colors).tolist(),
                    "attraction_matrix": np.asarray(cfg.attraction_matrix).tolist(),
                }
            self._send(200, json.dumps(out).encode())
        else:
            self._send(404, b"{}")

    def do_POST(self):
        if self.path != "/control":
            self._send(404, b"{}")
            return
        n = int(self.headers.get("Content-Length", "0"))
        try:
            req = json.loads(self.rfile.read(n) or b"{}")
        except json.JSONDecodeError as e:
            self._send(400, json.dumps({"error": f"invalid JSON: {e}"}).encode())
            return
        name, args = req.get("name"), req.get("args", {})
        with self.lock:
            try:
                self._dispatch(name, args)
                self._send(200, b'{"ok": true}')
            except KeyError as e:
                self._send(400, json.dumps(
                    {"error": f"missing argument {e} for {name!r}"}).encode())
            except Exception as e:  # surface config errors to the UI
                self._send(400, json.dumps({"error": str(e)}).encode())

    def _dispatch(self, name, args):
        app = self.app
        if name == "keys":
            app.handle_keys(set(args["keys"]), float(args["dt"]))
        elif name == "set_gravity":
            app.set_gravity(args["x"], args["y"], args["z"])
        elif name == "set_color":
            rgb = args["rgb"]
            if isinstance(rgb, str):  # '#rrggbb'
                rgb = [int(rgb[i:i + 2], 16) / 255.0 for i in (1, 3, 5)]
            app.set_color(int(args["species"]), rgb)
        elif name == "set_attraction":
            app.set_attraction(int(args["i"]), int(args["j"]), args["value"])
        elif name == "checkpoint":
            app.save("checkpoint.npz")
        elif name in ("set_particle_count", "set_world_size", "set_update_rate",
                      "set_walls", "set_effect_radius", "set_interaction_force",
                      "set_drag", "set_min_pull_ratio"):
            getattr(app, name)(args["value"])
        else:
            raise ValueError(f"unknown control {name!r}")


def serve(app: SimulationApp, port: int = 8000, host: str = "127.0.0.1"):
    _Handler.app = app
    _Handler.lock = threading.Lock()
    httpd = ThreadingHTTPServer((host, port), _Handler)
    print(f"particle3d-tpu UI on http://{host}:{port}")
    httpd.serve_forever()


def main(argv=None):
    import argparse

    from ..models import make_scene

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="reference")
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    a = p.parse_args(argv)
    state, cfg, dt = make_scene(a.preset, n=a.n)
    app = SimulationApp(state=state, cfg=cfg, update_rate=1.0 / dt)
    serve(app, a.port, a.host)


if __name__ == "__main__":
    main()
