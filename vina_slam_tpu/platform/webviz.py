"""Live web viewer — the RViz / start.launch.py visualization analog.

The reference's deployment story launches rviz2 with MarkerArray topics
(launch/start.launch.py, octree.cpp:758-949 publishers). This environment is
headless, so the TPU-native substitution is a zero-dependency web viewer:

  * `build_scene` / `write_scene_json` export the trajectory + plane/normal
    markers (same content and jet-color conventions as platform/viz.py) as
    one JSON scene document;
  * `serve` hosts a self-contained HTML5 canvas viewer (no external JS — it
    must work with zero egress) that polls the scene file every second, so a
    `cli run --live-scene out/scene.json` in one terminal and
    `cli viz --scene out/scene.json` in another give a live, orbitable view
    of the map while the run progresses.

Scene document schema:
  {"stamp": <unix s>, "frames": N,
   "trajectory": [[x,y,z], ...],
   "planes":  [{center, normal, scale, color}, ...],   # viz.py records
   "normals": [{start, end, color}, ...]}
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from vina_slam_tpu.platform.viz import (MarkerDiffer, collect_normal_markers,
                                        collect_plane_markers)


def build_scene(traj: np.ndarray, m, params, max_markers: int = 8000) -> dict:
    """Assemble the scene document from a (N, >=4) trajectory array
    (t, x, y, z, ...) and the voxel map."""
    import time

    traj = np.asarray(traj)
    pts = traj[:, 1:4].tolist() if traj.size else []
    return {
        "stamp": time.time(),
        "frames": len(pts),
        "trajectory": pts,
        "planes": collect_plane_markers(m, params, max_out=max_markers),
        "normals": collect_normal_markers(m, params, max_out=max_markers),
    }


def write_scene_json(path: str, traj, m, params, max_markers: int = 8000):
    """Atomic write so a polling viewer never reads a half-written file."""
    scene = build_scene(traj, m, params, max_markers=max_markers)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(scene, f)
    os.replace(tmp, path)


def _atomic_json(path: str, doc: dict):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)


class SceneStreamer:
    """Incremental live-scene protocol (the reference publishes add/delete
    marker updates keyed by stable voxel ids, octree.cpp:758-949, instead
    of full-scene snapshots — O(changed) per tick on a big map).

    Files in `dirpath`:
      scene.json  — full snapshot, carries "base" = its sequence number;
                    rewritten every `snapshot_every` ticks (late joiners).
      update.json — written EVERY tick: marker adds/deletes and trajectory
                    tail relative to the LAST snapshot ("base"-stamped), so
                    a viewer that misses ticks stays consistent: base scene
                    + the latest update is always the complete state.
    """

    def __init__(self, dirpath: str, snapshot_every: int = 10,
                 max_markers: int = 8000):
        self.dir = dirpath
        self.snapshot_every = snapshot_every
        self.max_markers = max_markers
        self._dp = MarkerDiffer()
        self._dn = MarkerDiffer()
        self._seq = 0
        self._base = 0
        self._traj_base = 0

    def tick(self, traj, m, params) -> dict:
        from vina_slam_tpu.platform.viz import (collect_normal_markers as cn,
                                                collect_plane_markers as cp)
        import time

        traj = np.asarray(traj)
        planes = cp(m, params, max_out=self.max_markers)
        normals = cn(m, params, max_out=self.max_markers)
        self._seq += 1
        if self._base == 0 or (self._seq - self._base) >= self.snapshot_every:
            scene = {
                "stamp": time.time(), "base": self._seq,
                "frames": int(traj.shape[0]),
                "trajectory": traj[:, 1:4].tolist() if traj.size else [],
                "planes": planes, "normals": normals,
            }
            _atomic_json(os.path.join(self.dir, "scene.json"), scene)
            self._dp.rebase(planes)
            self._dn.rebase(normals)
            self._base = self._seq
            self._traj_base = int(traj.shape[0])
            upd = {"seq": self._seq, "base": self._base,
                   "planes": {"add": [], "delete": []},
                   "normals": {"add": [], "delete": []},
                   "traj_add": [], "frames": int(traj.shape[0])}
        else:
            upd = {
                "seq": self._seq, "base": self._base,
                "planes": self._dp.diff(planes, rebase=False),
                "normals": self._dn.diff(normals, rebase=False),
                "traj_add": (traj[self._traj_base:, 1:4].tolist()
                             if traj.size else []),
                "frames": int(traj.shape[0]),
            }
        _atomic_json(os.path.join(self.dir, "update.json"), upd)
        return upd


# ------------------------------------------------------------------ server

_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>vina_slam_tpu viewer</title>
<style>
 body{margin:0;background:#101014;color:#ddd;font:12px monospace;overflow:hidden}
 #hud{position:fixed;top:8px;left:8px;background:#000a;padding:6px 10px;
      border-radius:4px;white-space:pre}
 canvas{display:block}
</style></head><body>
<div id="hud">loading…</div><canvas id="c"></canvas>
<script>
"use strict";
const cv=document.getElementById("c"),hud=document.getElementById("hud");
const ctx=cv.getContext("2d");
let scene={trajectory:[],planes:[],normals:[],frames:0,stamp:0};
let yaw=-0.7,pitch=0.5,dist=40,cx=0,cy=0,cz=0,drag=null,stale=0;
function resize(){cv.width=innerWidth;cv.height=innerHeight;}
addEventListener("resize",resize);resize();
cv.addEventListener("mousedown",e=>drag=[e.clientX,e.clientY,e.shiftKey]);
addEventListener("mouseup",()=>drag=null);
addEventListener("mousemove",e=>{
  if(!drag)return;
  const dx=e.clientX-drag[0],dy=e.clientY-drag[1];
  if(drag[2]){ // shift-drag pans in the view plane
    const s=dist/500;
    cx-=(Math.cos(yaw)*dx - Math.sin(yaw)*Math.sin(pitch)*dy)*s;
    cy-=(-Math.sin(yaw)*dx - Math.cos(yaw)*Math.sin(pitch)*dy)*s;
    cz+=Math.cos(pitch)*dy*s;
  }else{yaw+=dx*0.008;pitch=Math.max(-1.5,Math.min(1.5,pitch+dy*0.008));}
  drag=[e.clientX,e.clientY,drag[2]];draw();});
cv.addEventListener("wheel",e=>{dist*=Math.exp(e.deltaY*0.001);draw();});
function proj(p){
  // world -> camera: yaw about z, pitch about the view x-axis
  const x=p[0]-cx,y=p[1]-cy,z=p[2]-cz;
  const x1=Math.cos(yaw)*x+Math.sin(yaw)*y;
  const y1=-Math.sin(yaw)*x+Math.cos(yaw)*y;
  const z1=Math.cos(pitch)*z-Math.sin(pitch)*y1;
  const d=Math.sin(pitch)*z+Math.cos(pitch)*y1+dist;
  if(d<0.1)return null;
  const f=0.9*Math.min(cv.width,cv.height)/d*2.2;
  return [cv.width/2+x1*f,cv.height/2-z1*f,f];
}
function draw(){
  ctx.fillStyle="#101014";ctx.fillRect(0,0,cv.width,cv.height);
  for(const m of scene.planes){
    const s=proj(m.center);if(!s)continue;
    const r=Math.max(1,(m.scale?m.scale[0]:0.3)*s[2]/3);
    const c=m.color||[0.3,0.8,0.5];
    ctx.fillStyle=`rgba(${255*c[0]|0},${255*c[1]|0},${255*c[2]|0},0.55)`;
    ctx.beginPath();ctx.arc(s[0],s[1],Math.min(r,24),0,6.283);ctx.fill();
  }
  for(const a of scene.normals){
    const s=proj(a.start),e=proj(a.end);if(!s||!e)continue;
    const c=a.color||[1,1,1];
    ctx.strokeStyle=`rgba(${255*c[0]|0},${255*c[1]|0},${255*c[2]|0},0.8)`;
    ctx.beginPath();ctx.moveTo(s[0],s[1]);ctx.lineTo(e[0],e[1]);ctx.stroke();
  }
  const tr=scene.trajectory;
  if(tr.length){
    ctx.strokeStyle="#ff5050";ctx.lineWidth=2;ctx.beginPath();let started=false;
    for(const p of tr){const s=proj(p);if(!s)continue;
      started?ctx.lineTo(s[0],s[1]):ctx.moveTo(s[0],s[1]);started=true;}
    ctx.stroke();ctx.lineWidth=1;
    const last=proj(tr[tr.length-1]);
    if(last){ctx.fillStyle="#fff";ctx.beginPath();
      ctx.arc(last[0],last[1],4,0,6.283);ctx.fill();}
  }
  hud.textContent=`frames ${scene.frames}  planes ${scene.planes.length}`
    +`  normals ${scene.normals.length}\\n`
    +`drag orbit | shift-drag pan | wheel zoom${stale>3?"  [stale]":""}`;
}
let base=-1,seq=-1;
const baseP=new Map(),baseN=new Map();let baseTraj=[];
function centerOnce(){
  if(scene.trajectory.length&&cx===0&&cy===0&&cz===0){
    const p=scene.trajectory[scene.trajectory.length-1];
    cx=p[0];cy=p[1];cz=p[2];}}
async function loadFull(){
  const r=await fetch("scene.json",{cache:"no-store"});
  if(!r.ok)return false;
  const s=await r.json();
  scene=s;base=s.base===undefined?0:s.base;
  baseP.clear();for(const m of s.planes)baseP.set(m.id,m);
  baseN.clear();for(const a of s.normals)baseN.set(a.id,a);
  baseTraj=s.trajectory;centerOnce();draw();return true;
}
function applyUpdate(u){
  // updates are CUMULATIVE vs the base snapshot: rebuild base (+) update
  const P=new Map(baseP),N=new Map(baseN);
  for(const i of u.planes.delete)P.delete(i);
  for(const m of u.planes.add)P.set(m.id,m);
  for(const i of u.normals.delete)N.delete(i);
  for(const a of u.normals.add)N.set(a.id,a);
  scene={stamp:scene.stamp,frames:u.frames,
         trajectory:baseTraj.concat(u.traj_add),
         planes:[...P.values()],normals:[...N.values()]};
  centerOnce();draw();
}
async function poll(){
  try{
    // incremental protocol first (SceneStreamer); plain scene.json second
    const r=await fetch("update.json",{cache:"no-store"});
    if(r.ok){
      const u=await r.json();
      if(u.base!==base)await loadFull();
      if(u.base===base&&u.seq!==seq){seq=u.seq;stale=0;applyUpdate(u);}
      else if(u.seq===seq)stale++;
    }else{
      const rs=await fetch("scene.json",{cache:"no-store"});
      if(rs.ok){const s=await rs.json();
        if(s.stamp!==scene.stamp){scene=s;stale=0;centerOnce();draw();}
        else stale++;}
    }
  }catch(e){stale++;}
  setTimeout(poll,1000);
}
poll();draw();
</script></body></html>
"""


class _Handler(BaseHTTPRequestHandler):
    scene_path = ""

    def do_GET(self):  # noqa: N802  (http.server API)
        if self.path in ("/", "/index.html"):
            body = _HTML.encode()
            ctype = "text/html; charset=utf-8"
        elif (self.path.startswith("/scene.json")
              or self.path.startswith("/update.json")):
            # update.json (SceneStreamer's incremental tick) lives next to
            # the scene snapshot
            name = self.path.lstrip("/").split("?")[0]
            path = (self.scene_path if name == "scene.json" else
                    os.path.join(os.path.dirname(self.scene_path), name))
            try:
                with open(path, "rb") as f:
                    body = f.read()
            except OSError:
                self.send_response(404)
                self.end_headers()
                return
            ctype = "application/json"
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Cache-Control", "no-store")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


def serve(scene_path: str, port: int = 8008, background: bool = False):
    """Serve the viewer + scene file. Returns the server (background=True)
    or blocks forever."""
    handler = type("H", (_Handler,), {"scene_path": os.path.abspath(scene_path)})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    if background:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return srv
    print(f"viewer: http://127.0.0.1:{srv.server_address[1]}/  "
          f"(scene: {scene_path})")
    srv.serve_forever()
