"""Self-contained interactive HTML viewer for point clouds + boxes.

The headless counterpart of the reference's Open3D-GUI visualizer app
(/root/reference/ml3d/vis/visualizer.py:416-1750): where the reference
opens a desktop window with a cloud tree, per-attribute shading and
animation, this writes ONE dependency-free HTML file (inline WebGL2
renderer, data embedded as base64 Float32Arrays) offering the same
workflow in a browser: cloud list with visibility toggles, attribute
selector (label colors / scalar rainbow / uniform), point size, orbit +
pan + dolly camera, bounding-box line overlays, and an animation mode
that steps through the clouds.

No network access, no three.js — the renderer is ~200 lines of inline
WebGL2 (points via gl.POINTS, boxes via gl.LINES).
"""

import base64
import json
from os.path import join

import numpy as np

_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>open3d_ml_tpu viewer</title>
<style>
 body {{ margin:0; display:flex; height:100vh; font:13px sans-serif;
        background:#1b1b1f; color:#ddd; }}
 #side {{ width:240px; padding:10px; overflow-y:auto; background:#26262b; }}
 #side h3 {{ margin:6px 0; font-size:13px; color:#9cf; }}
 #gl {{ flex:1; }}
 label {{ display:block; margin:3px 0; cursor:pointer; }}
 select,input[type=range] {{ width:100%; }}
 button {{ margin:2px 2px 2px 0; }}
 .hint {{ color:#888; font-size:11px; }}
</style></head><body>
<div id="side">
 <h3>Clouds</h3><div id="clouds"></div>
 <h3>Shading</h3><select id="attr"></select>
 <h3>Point size</h3><input type="range" id="psize" min="1" max="8"
  value="2" step="0.5">
 <h3>Animation</h3>
 <button id="play">&#9654; play</button>
 <button id="stop">&#9632; stop</button>
 <div class="hint">drag: orbit &middot; shift-drag: pan &middot;
  wheel: dolly</div>
</div>
<canvas id="gl"></canvas>
<script>
const DATA = {data_json};
function decode(b64) {{
  const raw = atob(b64); const arr = new Uint8Array(raw.length);
  for (let i = 0; i < raw.length; i++) arr[i] = raw.charCodeAt(i);
  return new Float32Array(arr.buffer);
}}
for (const c of DATA.clouds) {{
  c.pos = decode(c.pos); delete c.pos_b64;
  for (const k in c.colors) c.colors[k] = decode(c.colors[k]);
}}
for (const b of DATA.boxes) {{ b.pos = decode(b.pos);
                               b.col = decode(b.col); }}

const canvas = document.getElementById('gl');
const gl = canvas.getContext('webgl2');
const vsrc = `#version 300 es
layout(location=0) in vec3 p; layout(location=1) in vec3 c;
uniform mat4 mvp; uniform float psz;
out vec3 vc;
void main() {{ gl_Position = mvp * vec4(p, 1.0); gl_PointSize = psz;
               vc = c; }}`;
const fsrc = `#version 300 es
precision mediump float; in vec3 vc; out vec4 o;
void main() {{ o = vec4(vc, 1.0); }}`;
function sh(t, s) {{ const h = gl.createShader(t); gl.shaderSource(h, s);
  gl.compileShader(h); return h; }}
const prog = gl.createProgram();
gl.attachShader(prog, sh(gl.VERTEX_SHADER, vsrc));
gl.attachShader(prog, sh(gl.FRAGMENT_SHADER, fsrc));
gl.linkProgram(prog); gl.useProgram(prog);
const uMVP = gl.getUniformLocation(prog, 'mvp');
const uPSZ = gl.getUniformLocation(prog, 'psz');

function makeBuf(arr) {{ const b = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, b);
  gl.bufferData(gl.ARRAY_BUFFER, arr, gl.STATIC_DRAW); return b; }}
for (const c of DATA.clouds) {{
  c.posBuf = makeBuf(c.pos); c.colBuf = {{}};
  for (const k in c.colors) c.colBuf[k] = makeBuf(c.colors[k]);
  c.n = c.pos.length / 3; c.visible = true;
}}
for (const b of DATA.boxes) {{ b.posBuf = makeBuf(b.pos);
  b.colBuf = makeBuf(b.col); b.n = b.pos.length / 3; }}

// scene bounds -> camera start
let lo = [1e9,1e9,1e9], hi = [-1e9,-1e9,-1e9];
for (const c of DATA.clouds) for (let i = 0; i < c.n; i++)
  for (let k = 0; k < 3; k++) {{
    const v = c.pos[3*i+k];
    if (v < lo[k]) lo[k] = v; if (v > hi[k]) hi[k] = v; }}
const ctr = [(lo[0]+hi[0])/2, (lo[1]+hi[1])/2, (lo[2]+hi[2])/2];
let dist = Math.max(hi[0]-lo[0], hi[1]-lo[1], hi[2]-lo[2]) * 1.5 + 1.0;
let yaw = 0.8, pitch = 0.5, pan = [0, 0];

function mat(out) {{
  const aspect = canvas.width / canvas.height;
  const f = 1.6, n = 0.05, fa = dist * 20;
  const cy = Math.cos(yaw), sy = Math.sin(yaw);
  const cp = Math.cos(pitch), sp = Math.sin(pitch);
  const eye = [ctr[0] + dist*cy*cp, ctr[1] + dist*sy*cp,
               ctr[2] + dist*sp];
  const fwd = norm3([ctr[0]-eye[0], ctr[1]-eye[1], ctr[2]-eye[2]]);
  const right = norm3(cross(fwd, [0,0,1]));
  const up = cross(right, fwd);
  const e2 = [eye[0] + right[0]*pan[0] + up[0]*pan[1],
              eye[1] + right[1]*pan[0] + up[1]*pan[1],
              eye[2] + right[2]*pan[0] + up[2]*pan[1]];
  const look = lookAt(e2, [ctr[0]+right[0]*pan[0]+up[0]*pan[1],
                           ctr[1]+right[1]*pan[0]+up[1]*pan[1],
                           ctr[2]+right[2]*pan[0]+up[2]*pan[1]], up);
  const proj = [f/aspect,0,0,0, 0,f,0,0,
                0,0,(fa+n)/(n-fa),-1, 0,0,2*fa*n/(n-fa),0];
  mul4(out, proj, look);
}}
function norm3(v) {{ const l = Math.hypot(v[0],v[1],v[2]) || 1;
  return [v[0]/l, v[1]/l, v[2]/l]; }}
function cross(a,b) {{ return [a[1]*b[2]-a[2]*b[1], a[2]*b[0]-a[0]*b[2],
  a[0]*b[1]-a[1]*b[0]]; }}
function lookAt(e, t, up) {{
  const z = norm3([e[0]-t[0], e[1]-t[1], e[2]-t[2]]);
  const x = norm3(cross(up, z)); const y = cross(z, x);
  return [x[0],y[0],z[0],0, x[1],y[1],z[1],0, x[2],y[2],z[2],0,
          -(x[0]*e[0]+x[1]*e[1]+x[2]*e[2]),
          -(y[0]*e[0]+y[1]*e[1]+y[2]*e[2]),
          -(z[0]*e[0]+z[1]*e[1]+z[2]*e[2]), 1];
}}
function mul4(o, a, b) {{
  for (let i = 0; i < 4; i++) for (let j = 0; j < 4; j++) {{
    let s = 0; for (let k = 0; k < 4; k++) s += a[k*4+j] * b[i*4+k];
    o[i*4+j] = s; }}
}}

const mvp = new Float32Array(16);
function draw() {{
  canvas.width = canvas.clientWidth; canvas.height = canvas.clientHeight;
  gl.viewport(0, 0, canvas.width, canvas.height);
  gl.clearColor(0.106, 0.106, 0.122, 1);
  gl.enable(gl.DEPTH_TEST);
  gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);
  mat(mvp); gl.uniformMatrix4fv(uMVP, false, mvp);
  gl.uniform1f(uPSZ, parseFloat(psize.value));
  const attr = attrSel.value;
  for (const c of DATA.clouds) {{
    if (!c.visible) continue;
    gl.bindBuffer(gl.ARRAY_BUFFER, c.posBuf);
    gl.enableVertexAttribArray(0);
    gl.vertexAttribPointer(0, 3, gl.FLOAT, false, 0, 0);
    const cb = c.colBuf[attr] || c.colBuf[Object.keys(c.colBuf)[0]];
    gl.bindBuffer(gl.ARRAY_BUFFER, cb);
    gl.enableVertexAttribArray(1);
    gl.vertexAttribPointer(1, 3, gl.FLOAT, false, 0, 0);
    gl.drawArrays(gl.POINTS, 0, c.n);
  }}
  gl.uniform1f(uPSZ, 1.0);
  for (const b of DATA.boxes) {{
    gl.bindBuffer(gl.ARRAY_BUFFER, b.posBuf);
    gl.enableVertexAttribArray(0);
    gl.vertexAttribPointer(0, 3, gl.FLOAT, false, 0, 0);
    gl.bindBuffer(gl.ARRAY_BUFFER, b.colBuf);
    gl.enableVertexAttribArray(1);
    gl.vertexAttribPointer(1, 3, gl.FLOAT, false, 0, 0);
    gl.drawArrays(gl.LINES, 0, b.n);
  }}
  requestAnimationFrame(draw);
}}

// ---- UI wiring
const cloudsDiv = document.getElementById('clouds');
const attrSel = document.getElementById('attr');
const psize = document.getElementById('psize');
const attrs = new Set();
for (const c of DATA.clouds) {{
  const l = document.createElement('label');
  const cb = document.createElement('input');
  cb.type = 'checkbox'; cb.checked = true;
  cb.onchange = () => {{ c.visible = cb.checked; }};
  l.appendChild(cb); l.appendChild(document.createTextNode(' ' + c.name));
  cloudsDiv.appendChild(l); c.checkbox = cb;
  for (const k in c.colors) attrs.add(k);
}}
for (const a of attrs) {{
  const o = document.createElement('option');
  o.value = a; o.textContent = a; attrSel.appendChild(o);
}}
let anim = null, animIdx = 0;
document.getElementById('play').onclick = () => {{
  if (anim) return;
  anim = setInterval(() => {{
    DATA.clouds.forEach((c, i) => {{
      c.visible = (i === animIdx % DATA.clouds.length);
      c.checkbox.checked = c.visible; }});
    animIdx++;
  }}, 700);
}};
document.getElementById('stop').onclick = () => {{
  clearInterval(anim); anim = null;
  DATA.clouds.forEach(c => {{ c.visible = true;
                              c.checkbox.checked = true; }});
}};

// ---- camera controls
let drag = null;
canvas.onmousedown = e => {{ drag = [e.clientX, e.clientY, e.shiftKey]; }};
window.onmouseup = () => {{ drag = null; }};
window.onmousemove = e => {{
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (drag[2]) {{ pan[0] -= dx * dist * 0.0015;
                  pan[1] += dy * dist * 0.0015; }}
  else {{ yaw += dx * 0.008;
          pitch = Math.min(1.5, Math.max(-1.5, pitch + dy * 0.008)); }}
  drag = [e.clientX, e.clientY, drag[2]];
}};
canvas.onwheel = e => {{ e.preventDefault();
  dist *= Math.exp(e.deltaY * 0.001); }};

draw();
</script></body></html>
"""


def _b64(arr):
    return base64.b64encode(
        np.ascontiguousarray(arr, np.float32).tobytes()).decode("ascii")


def export_html(clouds, out_dir, boxes=None, filename="index.html"):
    """Write the interactive viewer.

    Args:
        clouds: list of dicts {"name": str, "points": [N,3],
            "colors": {attr_name: [N,3] float 0..1}}.
        out_dir: target directory (must exist).
        boxes: optional list of dicts {"vertex_positions": [M,3],
            "line_colors" or "colors": [M,3]} — pre-built line vertex pairs
            (BoundingBox3D.create_lines out_format="dict").

    Returns the written path.
    """
    data = {"clouds": [], "boxes": []}
    for c in clouds:
        data["clouds"].append({
            "name": str(c["name"]),
            "pos": _b64(c["points"]),
            "colors": {k: _b64(v) for k, v in c["colors"].items()},
        })
    for b in boxes or []:
        cols = b.get("line_colors", b.get("colors"))
        data["boxes"].append({"pos": _b64(b["vertex_positions"]),
                              "col": _b64(cols)})
    path = join(out_dir, filename)
    with open(path, "w") as f:
        f.write(_HTML_TEMPLATE.format(data_json=json.dumps(data)))
    return path
