"""The workbench single-page app (vanilla HTML/JS, served by server.py).

Browser equivalent of the reference's three-panel Dear PyGui layout
(gui/workbench.py): element/bundle managers with introspected forms (left),
render viewport with orbit controls + ray-path overlay (center), spot
diagram / metrics / optimizer / project panels (right).
"""

INDEX_HTML = r"""<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>raytracetorch_tpu workbench</title>
<style>
  :root { color-scheme: dark; }
  body { margin:0; font:13px system-ui,sans-serif; background:#15171a;
         color:#d7dae0; display:flex; height:100vh; overflow:hidden; }
  .panel { overflow-y:auto; padding:10px; box-sizing:border-box; }
  #left { width:300px; background:#1c1f24; border-right:1px solid #2a2e35; }
  #center { flex:1; display:flex; flex-direction:column; align-items:center;
            justify-content:flex-start; padding:10px; }
  #right { width:330px; background:#1c1f24; border-left:1px solid #2a2e35; }
  h3 { margin:12px 0 6px; font-size:12px; text-transform:uppercase;
       letter-spacing:.08em; color:#8b93a1; }
  button { background:#2d6cdf; color:#fff; border:0; border-radius:4px;
           padding:5px 10px; margin:2px; cursor:pointer; font-size:12px; }
  button.sec { background:#3a3f48; }
  button.danger { background:#b33; }
  select,input { background:#23262c; color:#d7dae0; border:1px solid #3a3f48;
                 border-radius:3px; padding:3px 5px; font-size:12px; }
  input[type=number],input[type=text] { width:70px; }
  .item { padding:5px 7px; margin:3px 0; background:#23262c; border-radius:4px;
          cursor:pointer; display:flex; justify-content:space-between; }
  .item.sel { outline:1px solid #2d6cdf; }
  .form label { display:flex; justify-content:space-between; margin:3px 0;
                align-items:center; gap:4px; }
  .form .v3 input { width:46px; }
  #viewwrap { position:relative; }
  #view { border:1px solid #2a2e35; border-radius:4px; display:block; }
  #overlay { position:absolute; left:0; top:0; pointer-events:none; }
  #spot { background:#101214; border:1px solid #2a2e35; border-radius:4px; }
  #losschart { background:#101214; border:1px solid #2a2e35; border-radius:4px; }
  table { width:100%; border-collapse:collapse; font-size:12px; }
  td,th { padding:2px 5px; text-align:right; border-bottom:1px solid #2a2e35; }
  th { color:#8b93a1; }
  #status { color:#8b93a1; margin-top:6px; min-height:16px; font-size:12px; }
  .row { display:flex; gap:4px; align-items:center; flex-wrap:wrap; margin:3px 0; }
</style>
</head>
<body>
<div id="left" class="panel">
  <h3>Elements</h3>
  <div id="el-list"></div>
  <div class="row">
    <select id="el-class"></select>
    <button onclick="addElement()">Add</button>
  </div>
  <div id="el-form" class="form"></div>
  <h3>Sources</h3>
  <div id="bu-list"></div>
  <div class="row">
    <select id="bu-class"></select>
    <button onclick="addBundle()">Add</button>
  </div>
  <div id="bu-form" class="form"></div>
  <h3>Scene</h3>
  <div class="row">
    <label>sequential <input type="checkbox" id="seq"
      onchange="post('/api/settings',{sequential:this.checked}).then(refreshAll)"></label>
    <label>bounces <input type="number" id="nbounces" style="width:52px"
      onchange="post('/api/settings',{n_bounces:+this.value})"></label>
  </div>
</div>

<div id="center">
  <div id="viewwrap">
    <img id="view" width="640" height="480">
    <canvas id="overlay" width="640" height="480"></canvas>
  </div>
  <div class="row">
    <button onclick="doTrace()">Trace</button>
    <button class="sec" onclick="post('/api/camera',{reset:1}).then(rerender)">Reset view</button>
    <button class="sec" onclick="doUndo()">Undo</button>
    <button class="sec" onclick="doRedo()">Redo</button>
    <span style="color:#8b93a1">drag: orbit · shift: pan · wheel: zoom · click: pick ·
      ctrl-drag: move picked (R toggles rotate) · ctrl-Z/Y: undo/redo</span>
  </div>
  <div id="status"></div>
</div>

<div id="right" class="panel">
  <h3>Spot diagram <select id="spotsel" onchange="drawSpots(lastSpots)"
      style="font-size:11px"></select></h3>
  <canvas id="spot" width="300" height="300"></canvas>
  <div id="metrics"></div>
  <h3>Irradiance
    <select id="irrres" style="font-size:11px">
      <option>64</option><option selected>128</option><option>256</option>
    </select>
    <label style="font-size:11px"><input type="checkbox" id="irrlog"
      checked> log</label>
    <button onclick="doIrradiance()" style="font-size:11px">refresh</button>
  </h3>
  <img id="irr" width="300" height="300"
       style="background:#101214;border:1px solid #2a2e35;border-radius:4px;display:none">
  <div id="irrinfo" style="font-size:11px;color:#9aa"></div>
  <h3>Footprints
    <select id="fpsel" onchange="doFootprints()" style="font-size:11px">
    </select>
    <button onclick="doFootprints()" style="font-size:11px">refresh</button>
  </h3>
  <canvas id="fpcv" width="300" height="160"
          style="display:none;background:#101214;border:1px solid #2a2e35;border-radius:4px"></canvas>
  <div id="fptab" style="font-size:11px"></div>
  <h3>Interferogram
    <input type="number" id="itf-tilt" value="4" step="any"
      style="width:42px;font-size:11px" title="reference tilt fringes">
    <input type="number" id="itf-dz" value="0" step="any"
      style="width:42px;font-size:11px" title="defocus (lens units)">
    <button onclick="doInterferogram()" style="font-size:11px">refresh</button>
  </h3>
  <img id="itf" width="300" height="300"
       style="background:#101214;border:1px solid #2a2e35;border-radius:4px;display:none">
  <div id="itfinfo" style="font-size:11px;color:#9aa"></div>
  <h3>Through-focus
    <input type="number" id="tf-span" value="0.5" step="any"
      style="width:48px;font-size:11px" title="defocus half-span (lens units)">
    <button onclick="doThroughFocus()" style="font-size:11px">refresh</button>
  </h3>
  <img id="tfimg" width="300" height="160"
       style="background:#101214;border:1px solid #2a2e35;border-radius:4px;display:none">
  <div id="tfinfo" style="font-size:11px;color:#9aa"></div>
  <h3>Phase retrieval
    <input type="number" id="pr-ap" placeholder="pupil r" step="any"
      style="width:52px;font-size:11px"
      title="stop-down pupil radius (cold-start retrieval needs < ~lambda/2 of aberration)">
    <button onclick="doPhaseRetrieval()" style="font-size:11px">refresh</button>
  </h3>
  <img id="primg" width="300" height="100"
       style="background:#101214;border:1px solid #2a2e35;border-radius:4px;display:none">
  <div id="prtab" style="font-size:11px"></div>
  <div id="prinfo" style="font-size:11px;color:#9aa"></div>
  <h3>Image simulation
    <input type="text" id="is-fields" value="0, 0.05, 0.1"
      style="width:92px;font-size:11px"
      title="field slopes (comma separated)">
    <button onclick="doImageSim()" style="font-size:11px">refresh</button>
  </h3>
  <div style="display:flex;gap:4px">
    <img id="isobj" width="148" height="148" title="object"
         style="background:#101214;border:1px solid #2a2e35;border-radius:4px;display:none">
    <img id="isimg" width="148" height="148" title="simulated image"
         style="background:#101214;border:1px solid #2a2e35;border-radius:4px;display:none">
  </div>
  <div id="isinfo" style="font-size:11px;color:#9aa"></div>
  <h3>Aberrations
    <input type="number" id="sd-ap" placeholder="aperture" step="any"
      style="width:58px;font-size:11px" title="marginal-ray height at the stop">
    <input type="number" id="sd-field" value="0.02" step="any"
      style="width:48px;font-size:11px" title="chief-ray slope (field)">
    <button onclick="doSeidel()" style="font-size:11px">refresh</button>
  </h3>
  <div id="seidel" style="font-size:11px"></div>
  <h3>Ghosts
    <input type="number" id="gh-ap" placeholder="aperture" step="any"
      style="width:58px;font-size:11px" title="probe pupil radius">
    <button onclick="doGhosts()" style="font-size:11px">refresh</button>
  </h3>
  <div id="ghosts" style="font-size:11px"></div>
  <h3>Field / fans
    <input type="number" id="fc-max" value="0.05" step="any"
      style="width:48px;font-size:11px" title="max field slope">
    <input type="number" id="rf-field" value="0.0" step="any"
      style="width:44px;font-size:11px" title="fan field slope">
    <button onclick="doCurves()" style="font-size:11px">refresh</button>
  </h3>
  <canvas id="fieldcurves" width="300" height="110"
    style="background:#101214;border:1px solid #2a2e35;border-radius:4px"></canvas>
  <canvas id="rayfan" width="300" height="110"
    style="background:#101214;border:1px solid #2a2e35;border-radius:4px;margin-top:3px"></canvas>
  <div id="fcinfo" style="font-size:11px;color:#9aa"></div>
  <h3>Optimize</h3>
  <div class="row">
    <select id="loss"><option value="spot_size">spot size</option>
      <option value="focal_length">focal length</option></select>
    <input type="number" id="ftarget" placeholder="f target" style="width:70px">
  </div>
  <div class="row">
    steps <input type="number" id="steps" value="100">
    lr <input type="number" id="lr" value="0.001" step="0.0001">
    <button onclick="doOptimize()">Run</button>
  </div>
  <canvas id="losschart" width="300" height="90"></canvas>
  <h3>Project</h3>
  <div class="row">
    <input type="text" id="path" value="scene.rtt" style="width:150px">
    <button class="sec" onclick="post('/api/save',{path:val('path')}).then(()=>st('saved'))">Save</button>
    <button class="sec" onclick="post('/api/load',{path:val('path')}).then(refreshAll)">Load</button>
  </div>
  <div class="row">
    <input type="file" id="zmxfile" accept=".zmx,.ZMX" style="display:none"
           onchange="importZmx(this.files[0])">
    <button class="sec" onclick="$('zmxfile').click()">Import .zmx</button>
    <button class="sec" onclick="exportZmx()">Export .zmx</button>
  </div>
</div>

<script>
let REG = {elements:{}, bundles:{}}, STATE = null;
let selEl = -1, selBu = -1;
const $ = id => document.getElementById(id);
const val = id => $(id).value;
const st = m => { $('status').textContent = m; };
async function importZmx(file) {
  if (!file) return;
  const buf = await file.arrayBuffer();
  // .zmx ships UTF-16 (BOM) or ASCII — sniff the BOM client-side
  const u8 = new Uint8Array(buf);
  const enc = (u8[0] === 0xFF && u8[1] === 0xFE) ? 'utf-16le' :
              (u8[0] === 0xFE && u8[1] === 0xFF) ? 'utf-16be' : 'utf-8';
  const text = new TextDecoder(enc).decode(buf);
  const r = await post('/api/import_zmx', {text});
  st(`imported ${r.n_elements} elements` + (r.name ? ` (${r.name})` : ''));
  refreshAll();
}
async function exportZmx() {
  const r = await post('/api/export_zmx', {});
  const a = document.createElement('a');
  a.href = URL.createObjectURL(new Blob([r.text], {type:'text/plain'}));
  a.download = (val('path')||'scene').replace(/\.rtt$/,'') + '.zmx';
  a.click();
  st('exported .zmx');
}
async function post(url, body) {
  const r = await fetch(url, {method:'POST', body: JSON.stringify(body||{})});
  const j = await r.json();
  if (j.error) { st('error: ' + j.error); throw new Error(j.error); }
  return j;
}
async function get(url) { const r = await fetch(url); return r.json(); }

const FDEFS = {};   // id -> field def, for dynamic (pairs/nested) widgets

function pairRowHtml(id, row, labels) {
  return `<span class="prow">` +
    labels.map((lb,j)=>`<input type="number" step="any" title="${lb}" ` +
      `placeholder="${lb}" value="${row&&row[j]!=null?row[j]:''}">`).join('') +
    `<button type="button" onclick="this.parentNode.remove()">×</button></span>`;
}
function addPairRow(id) {
  const f = FDEFS[id];
  const d = document.createElement('div');
  d.innerHTML = pairRowHtml(id, null, f.labels);
  $(id).appendChild(d.firstChild);
}
function nestedSubHtml(id, subs, params) {
  return subs.map(sf => {
    const v = params && params[sf.name] !== undefined ? params[sf.name] : sf.default;
    return `<label>${sf.name}<input type="number" step="any" ` +
      `id="${id}-sub-${sf.name}" value="${v==null?'':v}"></label>`;
  }).join('');
}
function renderNested(id) {
  const f = FDEFS[id];
  const cls = $(id + '-class').value;
  $(id + '-sub').innerHTML = nestedSubHtml(id, f.choices[cls] || [], {});
}
function formHtml(fields, values, prefix) {
  let h = '';
  for (const f of fields) {
    const v = values && values[f.name] !== undefined ? values[f.name] : f.default;
    const id = prefix + '-' + f.name;
    if (f.kind === 'vec3') {
      const a = Array.isArray(v) ? v : [0,0,0];
      h += `<label>${f.name}<span class="v3">` +
        [0,1,2].map(i=>`<input type="number" step="any" id="${id}-${i}" value="${a[i]}">`).join('') +
        `</span></label>`;
    } else if (f.kind === 'bool') {
      h += `<label>${f.name}<input type="checkbox" id="${id}" ${v?'checked':''}></label>`;
    } else if (f.kind === 'str') {
      h += `<label>${f.name}<input type="text" id="${id}" value="${v==null?'':v}"></label>`;
    } else if (f.kind === 'select') {
      h += `<label>${f.name}<select id="${id}">` +
        f.options.map(o=>`<option ${o===(v||'')?'selected':''}>${o}</option>`).join('') +
        `</select></label>`;
    } else if (f.kind === 'pairs') {
      FDEFS[id] = f;
      let rows = Array.isArray(v) ? v : [];
      // legacy (n, d) coating rows widen to (n, k=0, d)
      if (f.name === 'coating')
        rows = rows.map(r => (Array.isArray(r) && r.length === 2)
                             ? [r[0], 0, r[1]] : r);
      // single-label lists (asphere coefficients) store flat scalars
      if (f.labels.length === 1)
        rows = rows.map(r => Array.isArray(r) ? r : [r]);
      h += `<label>${f.name}</label><div class="pairs" id="${id}">` +
        rows.map(r=>pairRowHtml(id, r, f.labels)).join('') + `</div>` +
        `<button type="button" onclick="addPairRow('${id}')">+ ${f.name} ` +
        `${f.name==='coating'?'layer':'term'}</button>`;
    } else if (f.kind === 'numlist') {
      const a = Array.isArray(v) ? v : [];
      h += `<label>${f.name}<span class="v3">` +
        f.labels.map((lb,j)=>`<input type="number" step="any" title="${lb}" ` +
          `placeholder="${lb}" id="${id}-${j}" value="${a[j]!=null?a[j]:''}">`).join('') +
        `</span></label>`;
    } else if (f.kind === 'nested') {
      FDEFS[id] = f;
      const cls = (v && v['class']) || Object.keys(f.choices)[0];
      h += `<label>${f.name}<select id="${id}-class" onchange="renderNested('${id}')">` +
        Object.keys(f.choices).map(c=>`<option ${c===cls?'selected':''}>${c}</option>`).join('') +
        `</select></label>` +
        `<div class="sub" id="${id}-sub" style="margin-left:10px">` +
        nestedSubHtml(id, f.choices[cls] || [], (v && v.params) || {}) + `</div>`;
    } else {
      h += `<label>${f.name}<input type="number" step="any" id="${id}" value="${v==null?'':v}"></label>`;
    }
  }
  return h;
}
function readForm(fields, prefix) {
  const out = {};
  for (const f of fields) {
    const id = prefix + '-' + f.name;
    if (f.kind === 'vec3') {
      out[f.name] = [0,1,2].map(i=>+($(id+'-'+i).value||0));
    } else if (f.kind === 'bool') {
      out[f.name] = $(id).checked;
    } else if (f.kind === 'str') {
      out[f.name] = $(id).value;
    } else if (f.kind === 'select') {
      const x = $(id).value;
      if (x !== '') out[f.name] = x;
    } else if (f.kind === 'pairs') {
      const rows = [];
      $(id).querySelectorAll('.prow').forEach(sp => {
        const ins = [...sp.querySelectorAll('input')];
        const vals = ins.map(i=>+(i.value||0));
        // 1-label lists are positional (a1[k] = a_{2k+4}): keep any
        // non-empty entry even if it is 0, and store flat scalars
        const keep = f.labels.length === 1 ? ins.some(i=>i.value!=='')
                                           : vals.some(x=>x!==0);
        if (keep) rows.push(f.labels.length === 1 ? vals[0] : vals);
      });
      if (rows.length) out[f.name] = rows;
    } else if (f.kind === 'numlist') {
      const vals = f.labels.map((_,j)=>$(id+'-'+j).value);
      if (vals.some(x=>x!=='')) out[f.name] = vals.map(x=>+(x||0));
    } else if (f.kind === 'nested') {
      const cls = $(id+'-class').value;
      const params = {};
      (FDEFS[id].choices[cls]||[]).forEach(sf => {
        const el = $(id+'-sub-'+sf.name);
        if (el && el.value !== '') params[sf.name] = +el.value;
      });
      out[f.name] = {'class': cls, params};
    } else {
      const x = $(id).value;
      if (x !== '') out[f.name] = +x;
    }
  }
  return out;
}

function renderLists() {
  const el = $('el-list'); el.innerHTML = '';
  STATE.elements.forEach((e,i)=>{
    const d = document.createElement('div');
    d.className = 'item' + (i===selEl?' sel':'');
    d.innerHTML = `<span>${e.config.name} <i style="color:#8b93a1">${e.config['class']}</i></span>`;
    d.onclick = ()=>{ selEl = i; renderLists(); showElForm(); };
    el.appendChild(d);
  });
  const bu = $('bu-list'); bu.innerHTML = '';
  STATE.bundles.forEach((b,i)=>{
    const d = document.createElement('div');
    d.className = 'item' + (i===selBu?' sel':'');
    d.innerHTML = `<span>${b.config['class']} <i style="color:#8b93a1">N=${b.n_rays}</i></span>`;
    d.onclick = ()=>{ selBu = i; renderLists(); showBuForm(); };
    bu.appendChild(d);
  });
  $('seq').checked = STATE.settings.sequential;
  $('nbounces').value = STATE.settings.n_bounces;
}
function showElForm() {
  const box = $('el-form');
  if (selEl < 0 || selEl >= STATE.elements.length) { box.innerHTML=''; return; }
  const e = STATE.elements[selEl];
  const fields = REG.elements[e.config['class']] || [];
  box.innerHTML = `<h3>${e.config.name}</h3>` +
    formHtml(fields, e.config.params, 'ef') +
    `<button onclick="updateElement()">Update</button>
     <button class="danger" onclick="deleteElement()">Delete</button>`;
}
function showBuForm() {
  const box = $('bu-form');
  if (selBu < 0 || selBu >= STATE.bundles.length) { box.innerHTML=''; return; }
  const b = STATE.bundles[selBu];
  const fields = REG.bundles[b.config['class']] || [];
  box.innerHTML = `<h3>${b.config['class']}</h3>` +
    `<label>n_rays<input type="number" id="bf-nrays" value="${b.n_rays}"></label>` +
    formHtml(fields, b.config.params, 'bf') +
    `<button onclick="updateBundle()">Update</button>
     <button class="danger" onclick="deleteBundle()">Delete</button>`;
}
async function addElement() {
  const cls = val('el-class');
  const fields = REG.elements[cls] || [];
  const params = {};
  fields.forEach(f=>{ if (f.default!=null) params[f.name]=f.default; });
  params.name = cls.toLowerCase() + '_' + (STATE.elements.length+1);
  await post('/api/element/add', {config:{'class':cls, name:params.name, params}});
  selEl = STATE.elements.length;
  await refreshAll();
}
async function updateElement() {
  const e = STATE.elements[selEl];
  const fields = REG.elements[e.config['class']] || [];
  const params = readForm(fields, 'ef');
  if (!params.name) params.name = e.config.name;
  await post('/api/element/update', {index:selEl,
    config:{'class':e.config['class'], name:params.name, params}});
  await refreshAll();
}
async function deleteElement() {
  await post('/api/element/delete', {index:selEl}); selEl=-1; await refreshAll();
}
async function addBundle() {
  const cls = val('bu-class');
  const fields = REG.bundles[cls] || [];
  const params = {};
  fields.forEach(f=>{ if (f.default!=null) params[f.name]=f.default; });
  await post('/api/bundle/add', {config:{'class':cls, params}, n_rays:1000});
  selBu = STATE.bundles.length;
  await refreshAll();
}
async function updateBundle() {
  const b = STATE.bundles[selBu];
  const fields = REG.bundles[b.config['class']] || [];
  const params = readForm(fields, 'bf');
  await post('/api/bundle/update', {index:selBu, n_rays:+val('bf-nrays'),
    config:{'class':b.config['class'], params}});
  await refreshAll();
}
async function deleteBundle() {
  await post('/api/bundle/delete', {index:selBu}); selBu=-1; await refreshAll();
}

async function rerender() {
  $('view').src = '/api/render?t=' + Date.now();
  clearOverlay();
}
function clearOverlay() {
  const c = $('overlay').getContext('2d');
  c.clearRect(0,0,640,480);
}
const PALETTE = ['#ffb347','#6fd3ff','#9dff6f','#ff6f9d','#d3a4ff','#fff36f'];
async function doTrace() {
  st('tracing…');
  const r = await post('/api/trace', {});
  lastSpots = r.spots;
  const sel = $('spotsel');
  sel.innerHTML = r.spots.map((_,i)=>`<option value="${i}">sensor ${i}</option>`).join('');
  clearOverlay();
  const c = $('overlay').getContext('2d');
  c.lineWidth = 1;
  for (const p of r.paths) {
    if (p.pts.length < 2) continue;
    c.strokeStyle = PALETTE[p.id % PALETTE.length] + '99';
    c.beginPath();
    c.moveTo(p.pts[0][0], p.pts[0][1]);
    for (const [u,v] of p.pts.slice(1)) c.lineTo(u, v);
    c.stroke();
  }
  drawSpots(r.spots);
  let mh = '<table><tr><th>sensor</th><th>bundle</th><th>RMS</th><th>cx</th><th>cy</th><th>w</th></tr>';
  for (const m of r.metrics)
    m.rms.forEach((rms,b)=>{
      mh += `<tr><td>${m.sensor}</td><td>${b}</td><td>${rms.toExponential(3)}</td>` +
            `<td>${m.centroid[b][0].toFixed(4)}</td><td>${m.centroid[b][1].toFixed(4)}</td>` +
            `<td>${m.weight[b].toFixed(1)}</td></tr>`;
    });
  $('metrics').innerHTML = mh + '</table>';
  st(`traced ${r.n_rays} rays, ${r.n_alive} alive`);
}
async function doIrradiance() {
  st('binning irradiance…');
  try {
    const r = await post('/api/irradiance', {
      sensor: +($('spotsel').value || 0),
      res: +$('irrres').value, log: $('irrlog').checked});
    if (r.error) { st('irradiance: ' + r.error); return; }
    const img = $('irr');
    img.src = 'data:image/png;base64,' + r.png;
    img.style.display = 'block';
    $('irrinfo').textContent =
      `±${r.half_extent.toPrecision(3)} · total ${r.total.toFixed(1)}` +
      ` · peak ${r.peak.toPrecision(3)} / cell`;
    st('irradiance ok');
  } catch (e) { st('irradiance failed: ' + e); }
}
async function doFootprints() {
  st('footprints…');
  try {
    const sel = $('fpsel');
    const body = sel.value ? {surface: sel.value} : {};
    const r = await post('/api/footprints', body);
    if (r.error) { st('footprints: ' + r.error); return; }
    const cur = sel.value;
    sel.innerHTML = r.table.map(t =>
      `<option${t.label === cur ? ' selected' : ''}>${t.label}</option>`
    ).join('');
    let h = '<table><tr><th style="text-align:left">surf</th>' +
      '<th>r_max</th><th>semi</th><th>fill</th></tr>';
    for (const t of r.table)
      h += `<tr><td style="text-align:left">${t.label}</td>` +
        `<td>${t.r_max.toPrecision(3)}</td>` +
        `<td>${t.semi_dia ? t.semi_dia.toPrecision(3) : '-'}</td>` +
        `<td>${t.fill ? (100 * t.fill).toFixed(0) + '%' : '-'}</td></tr>`;
    $('fptab').innerHTML = h + '</table>';
    if (r.points) {
      const cv = $('fpcv'), ctx = cv.getContext('2d');
      cv.style.display = 'block';
      ctx.fillStyle = '#101214';
      ctx.fillRect(0, 0, cv.width, cv.height);
      const pts = r.points;
      const semi = pts.semi_dia ||
        Math.max(...pts.x.map(Math.abs), ...pts.y.map(Math.abs), 1e-9);
      const s = Math.min(cv.width, cv.height) / (2.2 * semi);
      const cx = cv.width / 2, cy = cv.height / 2;
      if (pts.semi_dia) {
        ctx.strokeStyle = '#445';
        ctx.beginPath();
        ctx.arc(cx, cy, pts.semi_dia * s, 0, 2 * Math.PI);
        ctx.stroke();
      }
      ctx.fillStyle = '#6cf';
      for (let i = 0; i < pts.x.length; i++)
        ctx.fillRect(cx + pts.x[i] * s, cy - pts.y[i] * s, 1.4, 1.4);
    }
    st('footprints ok');
  } catch (e) { st('footprints failed: ' + e); }
}
async function doInterferogram() {
  st('tracing interferogram…');
  try {
    const r = await post('/api/interferogram', {
      tilt: +($('itf-tilt').value || 0),
      defocus: +($('itf-dz').value || 0)});
    if (r.error) { st('interferogram: ' + r.error); return; }
    const img = $('itf');
    img.src = 'data:image/png;base64,' + r.png;
    img.style.display = 'block';
    $('itfinfo').textContent =
      `wavefront rms ${r.rms_waves.toFixed(3)} waves · pupil r ` +
      r.pupil_radius.toPrecision(3);
    st('interferogram ok');
  } catch (e) { st('interferogram failed: ' + e); }
}
async function doThroughFocus() {
  st('propagating through focus…');
  try {
    const r = await post('/api/through_focus', {
      span: +($('tf-span').value || 0.5)});
    if (r.error) { st('through-focus: ' + r.error); return; }
    const img = $('tfimg');
    img.src = 'data:image/png;base64,' + r.png;
    img.style.display = 'block';
    $('tfinfo').textContent =
      `peak at dz ${r.z_peak.toFixed(3)} · working f/${r.f_number.toFixed(2)}`;
    st('through-focus ok');
  } catch (e) { st('through-focus failed: ' + e); }
}
async function doPhaseRetrieval() {
  st('phase diversity: rendering + retrieving…');
  try {
    const body = {};
    if ($('pr-ap').value !== '') body.pupil_radius = +$('pr-ap').value;
    const r = await post('/api/phase_retrieval', body);
    if (r.error) { st('phase retrieval: ' + r.error); return; }
    const img = $('primg');
    img.src = 'data:image/png;base64,' + r.png;
    img.style.display = 'block';
    let h = '<table><tr><th style="text-align:left">term</th>' +
      '<th>retrieved</th><th>fitted</th></tr>';
    for (const row of r.rows.slice(0, 8))
      h += `<tr><td style="text-align:left">${row.name}</td>` +
        `<td>${row.retrieved.toFixed(3)}</td>` +
        `<td>${row.fitted.toFixed(3)}</td></tr>`;
    h += '</table>';
    $('prtab').innerHTML = h;
    $('prinfo').textContent =
      `from images alone · f/${r.f_number.toFixed(2)} · pupil r ` +
      `${r.pupil_radius.toPrecision(3)} · max err ` +
      `${r.max_err_waves.toFixed(3)} waves` +
      (r.converged ? '' : ' · NOT CONVERGED — stop down (pupil r)');
    st('phase retrieval ' + (r.converged ? 'ok' : 'did not converge'));
  } catch (e) { st('phase retrieval failed: ' + e); }
}
async function doImageSim() {
  st('simulating image (field-varying PSF)…');
  try {
    const fields = ($('is-fields').value || '0')
      .split(',').map(s => +s.trim()).filter(v => !isNaN(v));
    const r = await post('/api/image_sim', {fields});
    if (r.error) { st('image sim: ' + r.error); return; }
    const o = $('isobj'), m = $('isimg');
    o.src = 'data:image/png;base64,' + r.object_png;
    m.src = 'data:image/png;base64,' + r.image_png;
    o.style.display = m.style.display = 'block';
    $('isinfo').textContent =
      `f/${r.f_number.toFixed(2)} · image heights ` +
      r.centers_y.map(v => v.toFixed(2)).join('/') + ' · MTF50 ' +
      r.mtf50.map(v => v.toFixed(0)).join('/') + ' cyc/mm';
    st('image sim ok');
  } catch (e) { st('image sim failed: ' + e); }
}
async function doSeidel() {
  st('seidel…');
  try {
    const body = {field: +($('sd-field').value || 0.02)};
    if ($('sd-ap').value !== '') body.aperture = +$('sd-ap').value;
    const r = await post('/api/seidel', body);
    const cols = ['S_I','S_II','S_III','S_IV','S_V','C_I','C_II'];
    let h = '<table><tr><th style="text-align:left">surf</th>' +
      cols.map(c=>`<th>${c}</th>`).join('') + '</tr>';
    for (const s of r.surfaces)
      h += `<tr><td style="text-align:left">${s.label}</td>` +
        cols.map(c=>`<td>${s[c].toExponential(1)}</td>`).join('') + '</tr>';
    h += `<tr><td style="text-align:left"><b>total</b></td>` +
      cols.map(c=>`<td><b>${r.totals[c].toExponential(1)}</b></td>`).join('') +
      '</tr></table>';
    const fo = r.first_order;
    h += `<div style="color:#9aa;margin-top:4px">` +
      `EFL ${fo.efl.toPrecision(5)} · f/${fo.fno.toPrecision(3)}` +
      ` · NA ${fo.na_image.toPrecision(3)} · BFL ${fo.bfl.toPrecision(4)}` +
      `<br>EnP ${fo.enp_z.toPrecision(4)} (r ${fo.enp_semi.toPrecision(3)})` +
      ` · ExP ${fo.exp_z.toPrecision(4)} (r ${fo.exp_semi.toPrecision(3)})` +
      `</div>`;
    h += `<div style="color:#9aa;margin-top:4px">` +
      `image z ${r.z_image.toFixed(4)} · ap ${r.aperture.toPrecision(3)}` +
      ` · field ${r.field}</div><table>` +
      Object.entries(r.derived).map(([k,v]) =>
        `<tr><td style="text-align:left">${k.replace(/_/g,' ')}</td>` +
        `<td>${v.toExponential(3)}</td></tr>`).join('') + '</table>';
    $('seidel').innerHTML = h;
    st('seidel ok');
  } catch (e) { st('seidel failed: ' + e); }
}
function plotXY(cv, series, title) {
  // series: [{x:[], y:[], color, label}] — autoscaled line chart
  const c = cv.getContext('2d');
  c.fillStyle = '#101214'; c.fillRect(0,0,cv.width,cv.height);
  let xs = [], ys = [];
  series.forEach(s => { xs = xs.concat(s.x); ys = ys.concat(s.y); });
  if (!xs.length) return;
  const xlo = Math.min(...xs), xhi = Math.max(...xs);
  const ylo = Math.min(...ys, 0), yhi = Math.max(...ys, 0);
  const X = x => 28 + (x - xlo)/Math.max(xhi - xlo, 1e-30) * (cv.width - 36);
  const Y = y => cv.height - 14 - (y - ylo)/Math.max(yhi - ylo, 1e-30) * (cv.height - 24);
  c.strokeStyle = '#2a2e35';
  c.beginPath(); c.moveTo(X(Math.min(Math.max(0, xlo), xhi)), 8);
  c.lineTo(X(Math.min(Math.max(0, xlo), xhi)), cv.height - 12); c.stroke();
  c.beginPath(); c.moveTo(26, Y(0)); c.lineTo(cv.width - 6, Y(0)); c.stroke();
  for (const s of series) {
    c.strokeStyle = s.color; c.beginPath();
    s.x.forEach((x, i) => i ? c.lineTo(X(x), Y(s.y[i])) : c.moveTo(X(x), Y(s.y[i])));
    c.stroke();
  }
  c.fillStyle = '#8b93a1'; c.fillText(title, 6, 11);
  let lx = cv.width - 6;
  for (const s of [...series].reverse()) {
    if (!s.label) continue;
    lx -= c.measureText(s.label).width + 10;
    c.fillStyle = s.color; c.fillText(s.label, lx, 11);
  }
  c.fillStyle = '#566'; c.font = '9px sans-serif';
  c.fillText(yhi.toExponential(1), 2, 20);
  c.fillText(ylo.toExponential(1), 2, cv.height - 4);
  c.font = '10px sans-serif';
}
async function doGhosts() {
  st('ghosts…');
  try {
    const body = {};
    if ($('gh-ap').value !== '') body.aperture = +$('gh-ap').value;
    const r = await post('/api/ghosts', body);
    let h = '<table><tr><th style="text-align:left">pair j→i</th>' +
      '<th>flux</th><th>z focus</th><th>r det</th><th>rel irr</th></tr>';
    for (const g of r.ghosts)
      h += `<tr><td style="text-align:left">${g.pair[1]} → ${g.pair[0]}</td>` +
        `<td>${g.flux.toExponential(2)}</td>` +
        `<td>${g.z_focus.toPrecision(4)}</td>` +
        `<td>${g.r_det.toPrecision(3)}</td>` +
        `<td>${g.rel_irr.toExponential(2)}</td></tr>`;
    h += '</table>' +
      `<div style="color:#9aa">${r.n_pairs} two-reflection sequences · ` +
      `primary flux ${r.primary_flux.toFixed(4)} · detector z ` +
      `${r.z_det.toFixed(3)}</div>`;
    $('ghosts').innerHTML = h;
    st('ghosts ok');
  } catch (e) { st('ghosts failed: ' + e); }
}
async function doCurves() {
  st('field scan…');
  try {
    const fs = await post('/api/fieldscan', {max_field: +val('fc-max')});
    plotXY($('fieldcurves'), [
      {x: fs.fields, y: fs.field_t, color: '#6fd3ff', label: 'T'},
      {x: fs.fields, y: fs.field_s, color: '#ffb347', label: 'S'},
      {x: fs.fields, y: fs.distortion_pct, color: '#9dff6f', label: 'dist%'},
    ], 'field curves');
    const rf = await post('/api/rayfan', {field: +val('rf-field')});
    const t = {x: [], y: []}, s = {x: [], y: []};
    rf.pupil.forEach((p, i) => {
      if (rf.alive_t[i]) { t.x.push(p); t.y.push(rf.ey_t[i]); }
      if (rf.alive_s[i]) { s.x.push(p); s.y.push(rf.ex_s[i]); }
    });
    plotXY($('rayfan'), [
      {x: t.x, y: t.y, color: '#6fd3ff', label: 'ey T'},
      {x: s.x, y: s.y, color: '#ffb347', label: 'ex S'},
    ], `ray fan @ field ${val('rf-field')}`);
    $('fcinfo').textContent = `image z ${fs.z_image.toFixed(4)} · ` +
      `rel illum ${fs.rel_illumination[fs.rel_illumination.length-1].toFixed(3)} at max field`;
    st('field scan ok');
  } catch (e) { st('field scan failed: ' + e); }
}
let lastSpots = [];
function drawSpots(spots) {
  const cv = $('spot'), c = cv.getContext('2d');
  c.fillStyle = '#101214'; c.fillRect(0,0,cv.width,cv.height);
  const si = +($('spotsel').value || 0);
  if (!spots.length || !spots[Math.min(si, spots.length-1)] ||
      !spots[Math.min(si, spots.length-1)].x.length) return;
  const s = spots[Math.min(si, spots.length-1)];
  let m = 1e-12;
  for (let i=0;i<s.x.length;i++) m = Math.max(m, Math.abs(s.x[i]), Math.abs(s.y[i]));
  const sc = (cv.width/2 - 10) / m;
  c.strokeStyle = '#2a2e35';
  c.beginPath(); c.moveTo(cv.width/2,0); c.lineTo(cv.width/2,cv.height);
  c.moveTo(0,cv.height/2); c.lineTo(cv.width,cv.height/2); c.stroke();
  for (let i=0;i<s.x.length;i++) {
    c.fillStyle = PALETTE[(s.id[i]||0) % PALETTE.length] + 'bb';
    c.fillRect(cv.width/2 + s.x[i]*sc - 1, cv.height/2 - s.y[i]*sc - 1, 2, 2);
  }
  c.fillStyle = '#8b93a1';
  c.fillText('±' + m.toExponential(2), 6, 12);
}
async function doOptimize() {
  st('optimizing…');
  const r = await post('/api/optimize', {loss: val('loss'), steps:+val('steps'),
    lr:+val('lr'), f_target: val('ftarget') ? +val('ftarget') : null});
  const cv = $('losschart'), c = cv.getContext('2d');
  c.fillStyle = '#101214'; c.fillRect(0,0,cv.width,cv.height);
  const L = r.losses, n = L.length;
  const lo = Math.min(...L), hi = Math.max(...L);
  c.strokeStyle = '#6fd3ff'; c.beginPath();
  L.forEach((v,i)=>{
    const x = i/(n-1) * (cv.width-10) + 5;
    const y = cv.height - 8 - (v-lo)/Math.max(hi-lo,1e-30) * (cv.height-16);
    i ? c.lineTo(x,y) : c.moveTo(x,y);
  });
  c.stroke();
  c.fillStyle = '#8b93a1';
  c.fillText(`loss ${L[0].toExponential(2)} → ${r.final_loss.toExponential(2)}`, 6, 12);
  st('optimized: ' + r.final_loss.toExponential(3));
  await refreshAll();
}

// undo / redo
async function doUndo() {
  try { await post('/api/undo', {}); st('undone'); await refreshAll(); }
  catch (e) {}
}
async function doRedo() {
  try { await post('/api/redo', {}); st('redone'); await refreshAll(); }
  catch (e) {}
}

// viewport mouse controls + pose gizmo
let gizmoRotate = false;
(() => {
  const v = $('view');
  let drag = null, moved = false, gizmo = false, gizmoBegun = false;
  v.addEventListener('mousedown', e => {
    drag = [e.clientX, e.clientY, e.shiftKey];
    gizmo = e.ctrlKey && selEl >= 0;
    gizmoBegun = false;
    moved = false;
  });
  window.addEventListener('mouseup', async e => {
    if (!drag) return;
    const wasDrag = moved, wasGizmo = gizmo;
    drag = null; gizmo = false;
    if (!wasDrag) {
      const rect = v.getBoundingClientRect();
      const r = await post('/api/pick', {x: e.clientX-rect.left, y: e.clientY-rect.top});
      if (r.element != null) { selEl = r.element; renderLists(); showElForm();
        st('picked ' + r.name + ' surface ' + r.surface +
           ' — ctrl-drag to ' + (gizmoRotate ? 'rotate' : 'move')); }
      else st('no hit');
    } else if (wasGizmo) {
      await refreshAll();        // forms pick up the new pose
    }
  });
  window.addEventListener('mousemove', async e => {
    if (!drag) return;
    const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
    if (Math.abs(dx) + Math.abs(dy) < 3) return;
    moved = true;
    drag[0] = e.clientX; drag[1] = e.clientY;
    if (gizmo) {
      const first = !gizmoBegun;
      gizmoBegun = true;   // set BEFORE the await: parallel mousemoves must
                           // not each claim the gesture's undo snapshot
      const r = await post('/api/gizmo', {index: selEl, delta: [dx, dy],
        mode: gizmoRotate ? 'rot' : 'trans', begin: first});
      st((gizmoRotate ? 'rot ' : 'pos ') +
         (gizmoRotate ? r.rot : r.trans).map(x=>x.toFixed(3)).join(', '));
    }
    else if (drag[2]) await post('/api/camera', {pan:[dx*0.05, dy*0.05]});
    else await post('/api/camera', {orbit:[dx*0.01, dy*0.01]});
    rerender();
  });
  v.addEventListener('wheel', async e => {
    e.preventDefault();
    await post('/api/camera', {zoom: e.deltaY > 0 ? -1 : 1});
    rerender();
  });
  window.addEventListener('keydown', e => {
    if (e.target.tagName === 'INPUT' || e.target.tagName === 'SELECT') return;
    if (e.ctrlKey && e.key === 'z' && !e.shiftKey) { e.preventDefault(); doUndo(); }
    else if (e.ctrlKey && (e.key === 'y' || (e.key === 'Z' && e.shiftKey)))
      { e.preventDefault(); doRedo(); }
    else if (e.key === 'r' || e.key === 'R') {
      gizmoRotate = !gizmoRotate;
      st('gizmo mode: ' + (gizmoRotate ? 'rotate' : 'move'));
    }
  });
})();

async function refreshAll() {
  [REG, STATE] = await Promise.all([get('/api/registry'), get('/api/state')]);
  const ec = $('el-class'); ec.innerHTML =
    Object.keys(REG.elements).map(c=>`<option>${c}</option>`).join('');
  const bc = $('bu-class'); bc.innerHTML =
    Object.keys(REG.bundles).map(c=>`<option>${c}</option>`).join('');
  renderLists(); showElForm(); showBuForm(); rerender();
}
refreshAll();
</script>
</body>
</html>
"""
