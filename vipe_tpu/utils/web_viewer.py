"""Interactive 3D artifact viewer (reference /root/reference/vipe/utils/
viser.py:84-448 — frustum + point-cloud scene with per-client playback).

The reference serves a ``viser`` web app; that package isn't in this image,
so this is a ZERO-DEPENDENCY equivalent: a stdlib ``http.server`` backend
serving a self-contained WebGL page (no CDN, works offline).  Features
mirrored from the reference app: artifact selection, temporal/spatial
subsampling, point-size control, playback (timestep slider + fps + play),
camera frustums and trajectory, orbit/pan/zoom navigation.

Scene data flows as binary Float32/Uint8 buffers per frame
(``/api/cloud``), unprojected server-side from the saved depth + pose +
intrinsics artifacts exactly like the reference's ``vipe_artifacts_scene``.
"""

from __future__ import annotations

import functools
import io as _io
import json
import pathlib
import struct
import threading
import zipfile
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

from . import io as io_utils


class SceneStore:
    """Lazy artifact loader with BOUNDED memory: per-scene metadata (poses,
    intrinsics, depth-zip namelist) is cached, but rgb/depth frames are
    decoded per request straight from the mp4/zip, and the assembled binary
    clouds sit in a small LRU — a long video never gets fully resident."""

    MAX_CLOUD_CACHE = 256  # LRU entries; ≲ tens of MB at viewer subsampling

    def __init__(self, root):
        self.root = pathlib.Path(root)
        self.artifacts: List[io_utils.ArtifactPath] = io_utils.ArtifactPath.glob(
            self.root
        )
        if not self.artifacts:
            raise FileNotFoundError(f"no artifacts under {root}")
        self._lock = threading.Lock()
        self._scenes: Dict[int, dict] = {}
        self._clouds: "OrderedDict[Tuple[int, int, int], bytes]" = OrderedDict()

    def names(self) -> List[str]:
        return [a.name for a in self.artifacts]

    @staticmethod
    def _decode_depth(data: bytes, name: str) -> np.ndarray:
        if name.endswith(".npy"):
            return np.load(_io.BytesIO(data)).astype(np.float32)
        from .exr import decode_exr

        try:
            return decode_exr(data)
        except Exception:
            return np.full((1, 1), np.nan, np.float32)

    def scene(self, idx: int) -> dict:
        with self._lock:
            if idx in self._scenes:
                return self._scenes[idx]
        art = self.artifacts[idx]
        mats, inds = io_utils.read_pose_artifacts(art)
        intr, camera_type = io_utils.read_intrinsics_artifacts(art)
        depth_names = None
        size = [0, 0]
        if art.depth_path.exists():
            with zipfile.ZipFile(art.depth_path) as zf:
                depth_names = sorted(zf.namelist())
                if depth_names:
                    d0 = self._decode_depth(
                        zf.read(depth_names[0]), depth_names[0]
                    )
                    size = list(d0.shape[:2])
        has_rgb = art.rgb_path.exists()
        if has_rgb and size == [0, 0]:
            import cv2

            cap = cv2.VideoCapture(str(art.rgb_path))
            size = [
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            ]
            cap.release()
        sc = {
            "mats": np.asarray(mats, np.float32),
            "inds": np.asarray(inds),
            "intr": np.asarray(intr, np.float32).reshape(-1),
            "camera_type": camera_type,
            "depth_names": depth_names,
            "has_rgb": has_rgb,
            "size": size,
        }
        with self._lock:
            self._scenes[idx] = sc
        return sc

    def _depth_frame(self, idx: int, frame: int) -> Optional[np.ndarray]:
        sc = self.scene(idx)
        names = sc["depth_names"]
        if names is None or frame >= len(names):
            return None
        with zipfile.ZipFile(self.artifacts[idx].depth_path) as zf:
            return self._decode_depth(zf.read(names[frame]), names[frame])

    def _rgb_frame(self, idx: int, frame: int) -> Optional[np.ndarray]:
        sc = self.scene(idx)
        if not sc["has_rgb"]:
            return None
        import cv2

        cap = cv2.VideoCapture(str(self.artifacts[idx].rgb_path))
        cap.set(cv2.CAP_PROP_POS_FRAMES, frame)
        ok, f = cap.read()
        cap.release()
        return f[..., ::-1] if ok else None  # BGR → RGB

    def meta(self, idx: int) -> dict:
        sc = self.scene(idx)
        return {
            "name": self.artifacts[idx].name,
            "n_frames": int(len(sc["mats"])),
            "traj": sc["mats"].reshape(-1).tolist(),
            "intrinsics": sc["intr"][:4].tolist(),
            "camera_type": sc["camera_type"],
            "has_depth": sc["depth_names"] is not None,
            "size": sc["size"],
        }

    def cloud(self, idx: int, frame: int, ssub: int) -> bytes:
        """Binary cloud: u32 count + f32 xyz·n + u8 rgb·n (world frame)."""
        key = (idx, frame, ssub)
        with self._lock:
            if key in self._clouds:
                self._clouds.move_to_end(key)
                return self._clouds[key]
        sc = self.scene(idx)
        depth = self._depth_frame(idx, frame)
        if depth is None:
            payload = struct.pack("<I", 0)
        else:
            depth = np.asarray(depth, np.float32)[::ssub, ::ssub]
            H, W = depth.shape
            fx, fy, cx, cy = sc["intr"][:4]
            u = (np.arange(0, W * ssub, ssub, dtype=np.float32) - cx) / fx
            v = (np.arange(0, H * ssub, ssub, dtype=np.float32) - cy) / fy
            uu, vv = np.meshgrid(u, v)
            valid = np.isfinite(depth) & (depth > 1e-4)
            z = np.where(valid, depth, 0.0)
            pts_cam = np.stack([uu * z, vv * z, z], -1).reshape(-1, 3)
            m = sc["mats"][frame]
            pts_w = pts_cam @ m[:3, :3].T + m[:3, 3]
            mask = valid.reshape(-1)
            pts_w = pts_w[mask].astype(np.float32)
            rgb = self._rgb_frame(idx, frame)
            if rgb is not None:
                rgb = rgb[::ssub, ::ssub]
                cols = rgb.reshape(-1, 3)[mask].astype(np.uint8)
            else:
                cols = np.full((len(pts_w), 3), 180, np.uint8)
            payload = (
                struct.pack("<I", len(pts_w))
                + pts_w.tobytes()
                + cols.tobytes()
            )
        with self._lock:
            self._clouds[key] = payload
            while len(self._clouds) > self.MAX_CLOUD_CACHE:
                self._clouds.popitem(last=False)
        return payload


def _make_handler(store: SceneStore):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                url = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                if url.path == "/":
                    self._send(200, _PAGE.encode(), "text/html")
                elif url.path == "/api/artifacts":
                    self._send(
                        200, json.dumps(store.names()).encode(),
                        "application/json",
                    )
                elif url.path == "/api/scene":
                    meta = store.meta(int(q.get("id", 0)))
                    self._send(
                        200, json.dumps(meta).encode(), "application/json"
                    )
                elif url.path == "/api/cloud":
                    buf = store.cloud(
                        int(q.get("id", 0)), int(q.get("frame", 0)),
                        max(int(q.get("ssub", 4)), 1),
                    )
                    self._send(200, buf, "application/octet-stream")
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # surface errors to the client
                self._send(500, str(e).encode(), "text/plain")

    return Handler


def serve(artifact_root, port: int = 8080, open_browser: bool = False,
          block: bool = True) -> Optional[ThreadingHTTPServer]:
    """Start the viewer server (reference run_viser, viser.py:399-448)."""
    store = SceneStore(artifact_root)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), _make_handler(store))
    print(f"[viewer] serving {artifact_root} on http://localhost:{port}")
    if block:
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()
        return None
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


# --------------------------------------------------------------------------
# Self-contained WebGL frontend (no external assets).
# --------------------------------------------------------------------------

_PAGE = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>vipe-tpu viewer</title>
<style>
 body{margin:0;background:#111;color:#ddd;font:13px sans-serif;overflow:hidden}
 #hud{position:fixed;top:10px;left:10px;background:#000a;padding:10px 14px;
      border-radius:8px;min-width:230px}
 #hud label{display:block;margin:6px 0 2px}
 #hud input[type=range]{width:200px}
 canvas{display:block}
 button{margin-right:6px}
</style></head><body>
<canvas id="gl"></canvas>
<div id="hud">
 <b>vipe-tpu viewer</b>
 <label>Artifact <select id="artifact"></select></label>
 <label>Frame <span id="fval">0</span>
  <input type="range" id="frame" min="0" max="0" value="0"></label>
 <label><button id="play">Play</button> fps
  <input type="range" id="fps" min="1" max="30" value="10" style="width:90px"></label>
 <label>Point size <input type="range" id="psize" min="1" max="8" value="2"></label>
 <label>Spatial subsample <input type="range" id="ssub" min="1" max="8" value="4"></label>
 <label>Temporal subsample <input type="range" id="tsub" min="1" max="16" value="4"></label>
 <label><input type="checkbox" id="accum" checked> accumulate map</label>
 <span id="status"></span>
</div>
<script>
"use strict";
const canvas = document.getElementById("gl");
const gl = canvas.getContext("webgl");
const VS = `attribute vec3 p; attribute vec3 c; uniform mat4 mvp;
uniform float ps; varying vec3 vc;
void main(){ gl_Position = mvp*vec4(p,1.0); gl_PointSize = ps; vc = c; }`;
const FS = `precision mediump float; varying vec3 vc;
void main(){ gl_FragColor = vec4(vc,1.0); }`;
const LVS = `attribute vec3 p; uniform mat4 mvp;
void main(){ gl_Position = mvp*vec4(p,1.0); }`;
const LFS = `precision mediump float; uniform vec3 col;
void main(){ gl_FragColor = vec4(col,1.0); }`;
function compile(vs, fs){
  function sh(t, src){ const s = gl.createShader(t); gl.shaderSource(s, src);
    gl.compileShader(s); return s; }
  const pr = gl.createProgram();
  gl.attachShader(pr, sh(gl.VERTEX_SHADER, vs));
  gl.attachShader(pr, sh(gl.FRAGMENT_SHADER, fs));
  gl.linkProgram(pr); return pr;
}
const progP = compile(VS, FS), progL = compile(LVS, LFS);

// ---- tiny mat4 helpers (column major) ----
function mul(a,b){ const o = new Float32Array(16);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++){let s=0;
  for(let k=0;k<4;k++)s+=a[k*4+j]*b[i*4+k];o[i*4+j]=s;}return o;}
function persp(fov,asp,n,f){const t=1/Math.tan(fov/2);
 return new Float32Array([t/asp,0,0,0, 0,t,0,0, 0,0,(f+n)/(n-f),-1,
  0,0,2*f*n/(n-f),0]);}
function lookAt(eye,ct,up){
 const z=norm3(sub3(eye,ct)),x=norm3(cross(up,z)),y=cross(z,x);
 return new Float32Array([x[0],y[0],z[0],0, x[1],y[1],z[1],0,
  x[2],y[2],z[2],0, -dot3(x,eye),-dot3(y,eye),-dot3(z,eye),1]);}
function sub3(a,b){return [a[0]-b[0],a[1]-b[1],a[2]-b[2]];}
function add3(a,b){return [a[0]+b[0],a[1]+b[1],a[2]+b[2]];}
function scale3(a,s){return [a[0]*s,a[1]*s,a[2]*s];}
function cross(a,b){return [a[1]*b[2]-a[2]*b[1],a[2]*b[0]-a[0]*b[2],
 a[0]*b[1]-a[1]*b[0]];}
function dot3(a,b){return a[0]*b[0]+a[1]*b[1]+a[2]*b[2];}
function norm3(a){const l=Math.hypot(a[0],a[1],a[2])||1;return scale3(a,1/l);}

// ---- state ----
let meta=null, clouds={}, center=[0,0,0], radius=3;
let theta=-1.2, phi=0.5, dist=4, pan=[0,0,0];
let playing=false, lastT=0;
const $ = id => document.getElementById(id);

async function loadArtifacts(){
  const names = await (await fetch("/api/artifacts")).json();
  const sel = $("artifact");
  sel.innerHTML = names.map((n,i)=>`<option value=${i}>${n}</option>`).join("");
  sel.onchange = loadScene;
  await loadScene();
}
async function loadScene(){
  const id = $("artifact").value|0;
  meta = await (await fetch(`/api/scene?id=${id}`)).json();
  $("frame").max = Math.max(meta.n_frames-1, 0);
  clouds = {};
  // fit view to trajectory
  let mn=[1e9,1e9,1e9],mx=[-1e9,-1e9,-1e9];
  for(let k=0;k<meta.n_frames;k++){
    const p=[meta.traj[k*16+3],meta.traj[k*16+7],meta.traj[k*16+11]];
    for(let i=0;i<3;i++){mn[i]=Math.min(mn[i],p[i]);mx[i]=Math.max(mx[i],p[i]);}
  }
  center = scale3(add3(mn,mx),0.5); pan=[0,0,0];
  radius = Math.max(Math.hypot(...sub3(mx,mn)), 1); dist = radius*2.2;
  prefetch();
}
async function fetchCloud(f){
  const id = $("artifact").value|0, ss = $("ssub").value|0;
  const key = `${id}:${f}:${ss}`;
  if(clouds[key]) return clouds[key];
  const buf = await (await fetch(`/api/cloud?id=${id}&frame=${f}&ssub=${ss}`))
    .arrayBuffer();
  const n = new Uint32Array(buf, 0, 1)[0];
  const pos = new Float32Array(buf, 4, n*3);
  const col = new Uint8Array(buf, 4+n*12, n*3);
  const colf = new Float32Array(n*3);
  for(let i=0;i<n*3;i++) colf[i]=col[i]/255;
  const vp = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, vp);
  gl.bufferData(gl.ARRAY_BUFFER, pos, gl.STATIC_DRAW);
  const vc = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, vc);
  gl.bufferData(gl.ARRAY_BUFFER, colf, gl.STATIC_DRAW);
  clouds[key] = {n, vp, vc};
  return clouds[key];
}
async function prefetch(){
  if(!meta || !meta.has_depth) return;
  const ts = $("tsub").value|0;
  for(let f=0; f<meta.n_frames; f+=ts){
    await fetchCloud(f);
    $("status").textContent = `loaded ${f+1}/${meta.n_frames}`;
  }
  $("status").textContent = "";
}

// ---- interaction ----
canvas.onmousedown = e => {
  const rot = e.button === 0 && !e.shiftKey;
  const sx = e.clientX, sy = e.clientY, t0 = theta, p0 = phi, pn0 = [...pan];
  const mm = ev => {
    const dx = ev.clientX - sx, dy = ev.clientY - sy;
    if(rot){ theta = t0 + dx*0.008; phi = Math.max(-1.5, Math.min(1.5, p0 + dy*0.008)); }
    else { pan = add3(pn0, scale3([-dx, dy, 0], dist*0.0015)); }
  };
  const up = () => { window.removeEventListener("mousemove", mm);
    window.removeEventListener("mouseup", up); };
  window.addEventListener("mousemove", mm);
  window.addEventListener("mouseup", up);
};
canvas.oncontextmenu = e => e.preventDefault();
canvas.onwheel = e => { dist *= Math.exp(e.deltaY*0.001); e.preventDefault(); };
$("play").onclick = () => { playing = !playing;
  $("play").textContent = playing ? "Pause" : "Play"; };
$("ssub").onchange = () => { clouds = {}; prefetch(); };
$("tsub").onchange = prefetch;

// ---- render ----
function frustumLines(m, intr, size){
  const [fx,, cx, cy] = [intr[0], intr[1], intr[2], intr[3]];
  const w = cx*2, h = cy*2, z = size, X = cx/fx*z, Y = cy/fx*z;
  const cs = [[0,0,0],[ X, Y,z],[-X, Y,z],[-X,-Y,z],[ X,-Y,z]];
  const wpts = cs.map(p => [
    m[0]*p[0]+m[1]*p[1]+m[2]*p[2]+m[3],
    m[4]*p[0]+m[5]*p[1]+m[6]*p[2]+m[7],
    m[8]*p[0]+m[9]*p[1]+m[10]*p[2]+m[11]]);
  const idx = [[0,1],[0,2],[0,3],[0,4],[1,2],[2,3],[3,4],[4,1]];
  const out = [];
  for(const [a,b] of idx){ out.push(...wpts[a], ...wpts[b]); }
  return out;
}
function draw(ts){
  requestAnimationFrame(draw);
  if(!meta) return;
  if(playing && ts - lastT > 1000/($("fps").value|0)){
    lastT = ts;
    const fr = $("frame");
    fr.value = ((fr.value|0) + ($("tsub").value|0)) % meta.n_frames;
  }
  const f = $("frame").value|0; $("fval").textContent = f;
  canvas.width = innerWidth; canvas.height = innerHeight;
  gl.viewport(0, 0, canvas.width, canvas.height);
  gl.clearColor(0.07, 0.07, 0.08, 1);
  gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);
  gl.enable(gl.DEPTH_TEST);

  const eye = add3(add3(center, pan), [dist*Math.cos(phi)*Math.cos(theta),
    dist*Math.sin(phi), dist*Math.cos(phi)*Math.sin(theta)]);
  const view = lookAt(eye, add3(center, pan), [0,-1,0]);
  const proj = persp(0.9, canvas.width/canvas.height, 0.01*radius, 100*radius);
  const mvp = mul(proj, view);

  // clouds
  gl.useProgram(progP);
  gl.uniformMatrix4fv(gl.getUniformLocation(progP, "mvp"), false, mvp);
  gl.uniform1f(gl.getUniformLocation(progP, "ps"), $("psize").value);
  const ts_ = $("tsub").value|0, id = $("artifact").value|0,
        ss = $("ssub").value|0;
  const want = $("accum").checked
    ? Array.from({length: Math.floor(f/ts_)+1}, (_,i)=>i*ts_)
    : [f - (f % ts_)];
  for(const k of want){
    const c = clouds[`${id}:${k}:${ss}`];
    if(!c || !c.n) continue;
    const lp = gl.getAttribLocation(progP, "p");
    gl.bindBuffer(gl.ARRAY_BUFFER, c.vp);
    gl.enableVertexAttribArray(lp);
    gl.vertexAttribPointer(lp, 3, gl.FLOAT, false, 0, 0);
    const lc = gl.getAttribLocation(progP, "c");
    gl.bindBuffer(gl.ARRAY_BUFFER, c.vc);
    gl.enableVertexAttribArray(lc);
    gl.vertexAttribPointer(lc, 3, gl.FLOAT, false, 0, 0);
    gl.drawArrays(gl.POINTS, 0, c.n);
  }

  // trajectory + current frustum
  gl.useProgram(progL);
  gl.uniformMatrix4fv(gl.getUniformLocation(progL, "mvp"), false, mvp);
  const lp2 = gl.getAttribLocation(progL, "p");
  const traj = [];
  for(let k=0;k<meta.n_frames;k++)
    traj.push(meta.traj[k*16+3], meta.traj[k*16+7], meta.traj[k*16+11]);
  const tb = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, tb);
  gl.bufferData(gl.ARRAY_BUFFER, new Float32Array(traj), gl.STREAM_DRAW);
  gl.enableVertexAttribArray(lp2);
  gl.vertexAttribPointer(lp2, 3, gl.FLOAT, false, 0, 0);
  gl.uniform3f(gl.getUniformLocation(progL, "col"), 1.0, 0.8, 0.1);
  gl.drawArrays(gl.LINE_STRIP, 0, meta.n_frames);
  gl.deleteBuffer(tb);

  const m = meta.traj.slice(f*16, f*16+16);
  const fl = frustumLines(m, meta.intrinsics, radius*0.08);
  const fb = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, fb);
  gl.bufferData(gl.ARRAY_BUFFER, new Float32Array(fl), gl.STREAM_DRAW);
  gl.vertexAttribPointer(lp2, 3, gl.FLOAT, false, 0, 0);
  gl.uniform3f(gl.getUniformLocation(progL, "col"), 0.2, 0.9, 1.0);
  gl.drawArrays(gl.LINES, 0, fl.length/3);
  gl.deleteBuffer(fb);
}
loadArtifacts();
requestAnimationFrame(draw);
</script></body></html>
"""
