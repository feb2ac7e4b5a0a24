"""Voice-design web UI (reference examples/gradio_voice_design.py:1-216).

The reference ships a Gradio app for the VoiceDesign flow (text + natural-
language voice instruction + language -> audio). Gradio is not available in
this environment, and a server-rendered page is the TPU-framework-native
answer anyway: the serving stack already streams PCM over HTTP, so the UI is
a single self-contained HTML page that calls `POST /v1/audio/speech` with
``mode="voice_design"`` and plays the chunked PCM16 stream via Web Audio as
it arrives (the Gradio app waited for the full waveform; streaming playback
is strictly better and exercises the same engine path).

Feature parity with the Gradio app:
  * text / instruction / language inputs with the same defaults
    (gradio_voice_design.py:130-152);
  * the same four example instruction rows (gradio_voice_design.py:108-121);
  * the "tips for voice instructions" help section (:178-198);
  * custom-voice speaker dropdown as a bonus tab (the page also fronts the
    CustomVoice mode using `GET /voices`).

Served by `TTSServer` at ``GET /`` and ``GET /ui``.
"""

LANGUAGES = [
    "Auto", "English", "Chinese", "Japanese", "Korean", "German",
    "French", "Russian", "Portuguese", "Spanish", "Italian",
]

# the reference's example rows, gradio_voice_design.py:108-121
EXAMPLES = [
    ("Hello, this is a demonstration of the voice design system.",
     "Male, 35 years old, deep and authoritative voice", "English"),
    ("Welcome to our text-to-speech service!",
     "Female, 25 years old, cheerful and energetic", "English"),
    ("Thank you for using our system.",
     "Male, 40 years old, calm and professional", "English"),
    ("I'm excited to show you what I can do!",
     "Female, 20 years old, enthusiastic and young", "English"),
]

_CSS = """
:root { --bg:#0f1117; --panel:#181b24; --edge:#2a2f3d; --fg:#e8eaf0;
        --dim:#9aa1b2; --accent:#4f8cff; --accent2:#39d98a; }
* { box-sizing:border-box; }
body { margin:0; font:15px/1.5 system-ui,-apple-system,Segoe UI,sans-serif;
       background:var(--bg); color:var(--fg); }
.wrap { max-width:960px; margin:0 auto; padding:28px 20px 60px; }
h1 { font-size:26px; margin:0 0 4px; }
.sub { color:var(--dim); margin-bottom:24px; }
.grid { display:grid; grid-template-columns:1fr 1fr; gap:20px; }
@media (max-width:760px){ .grid { grid-template-columns:1fr; } }
.card { background:var(--panel); border:1px solid var(--edge);
        border-radius:10px; padding:18px; }
label { display:block; font-weight:600; margin:12px 0 4px; }
label:first-child { margin-top:0; }
textarea, select, input { width:100%; background:#10131b; color:var(--fg);
  border:1px solid var(--edge); border-radius:6px; padding:9px 10px;
  font:inherit; resize:vertical; }
button.primary { margin-top:16px; width:100%; padding:12px; font-size:16px;
  font-weight:700; color:#fff; background:var(--accent); border:none;
  border-radius:8px; cursor:pointer; }
button.primary:disabled { opacity:.5; cursor:default; }
.status { margin-top:10px; color:var(--dim); min-height:1.4em; }
.examples table { width:100%; border-collapse:collapse; margin-top:8px;
  font-size:13.5px; }
.examples td { border-top:1px solid var(--edge); padding:8px 6px;
  cursor:pointer; color:var(--dim); }
.examples tr:hover td { color:var(--fg); background:#1d212c; }
details { margin-top:20px; color:var(--dim); }
details summary { cursor:pointer; color:var(--fg); font-weight:600; }
code { background:#10131b; padding:1px 5px; border-radius:4px; }
.tabs { display:flex; gap:8px; margin-bottom:16px; }
.tabs button { padding:8px 14px; border-radius:8px; border:1px solid
  var(--edge); background:var(--panel); color:var(--dim); cursor:pointer; }
.tabs button.on { color:var(--fg); border-color:var(--accent);
  background:#1b2435; }
audio { width:100%; margin-top:12px; }
.meter { height:6px; border-radius:3px; background:#10131b; margin-top:14px;
  overflow:hidden; }
.meter div { height:100%; width:0; background:var(--accent2);
  transition:width .2s; }
"""

_JS = """
const $ = id => document.getElementById(id);
let audioCtx = null, playhead = 0, streaming = false;

function setTab(mode) {
  $('tab-design').classList.toggle('on', mode === 'design');
  $('tab-custom').classList.toggle('on', mode === 'custom');
  $('row-instruct').style.display = mode === 'design' ? '' : 'none';
  $('row-voice').style.display = mode === 'custom' ? '' : 'none';
  $('gen').dataset.mode = mode;
}

async function loadVoices() {
  try {
    const r = await fetch('/voices'); const j = await r.json();
    const sel = $('voice'); sel.innerHTML = '';
    for (const v of [...(j.voices||[]), ...(j.cloned||[])]) {
      const o = document.createElement('option'); o.textContent = v;
      sel.appendChild(o);
    }
  } catch (e) { /* engine may still be warming */ }
}

function useExample(tr) {
  const td = tr.children;
  $('text').value = td[0].textContent;
  $('instruct').value = td[1].textContent;
  $('language').value = td[2].textContent;
  setTab('design');
}

function schedule(f32) {
  // stream-play a Float32 PCM block at 24 kHz via Web Audio
  if (!audioCtx) { audioCtx = new (window.AudioContext ||
      window.webkitAudioContext)({sampleRate: 24000}); playhead = 0; }
  const buf = audioCtx.createBuffer(1, f32.length, 24000);
  buf.copyToChannel(f32, 0);
  const src = audioCtx.createBufferSource();
  src.buffer = buf; src.connect(audioCtx.destination);
  playhead = Math.max(playhead, audioCtx.currentTime + 0.05);
  src.start(playhead); playhead += buf.duration;
}

function wavBlob(blocks) {
  // assemble a 24 kHz PCM16 mono WAV for the <audio> element / download
  const n = blocks.reduce((a, b) => a + b.length, 0);
  const ab = new ArrayBuffer(44 + n * 2); const dv = new DataView(ab);
  const w = (o, s) => { for (let i = 0; i < s.length; i++)
      dv.setUint8(o + i, s.charCodeAt(i)); };
  w(0,'RIFF'); dv.setUint32(4, 36 + n*2, true); w(8,'WAVEfmt ');
  dv.setUint32(16,16,true); dv.setUint16(20,1,true); dv.setUint16(22,1,true);
  dv.setUint32(24,24000,true); dv.setUint32(28,48000,true);
  dv.setUint16(32,2,true); dv.setUint16(34,16,true); w(36,'data');
  dv.setUint32(40, n*2, true);
  let o = 44;
  for (const b of blocks) for (let i = 0; i < b.length; i++, o += 2)
    dv.setInt16(o, b[i], true);
  return new Blob([ab], {type:'audio/wav'});
}

async function generate() {
  if (streaming) return;
  const mode = $('gen').dataset.mode || 'design';
  const text = $('text').value.trim();
  const instruct = $('instruct').value.trim();
  if (!text || (mode === 'design' && !instruct)) {
    $('status').textContent = 'Enter text' +
        (mode === 'design' ? ' and a voice instruction.' : '.'); return;
  }
  streaming = true; $('gen').disabled = true;
  $('status').textContent = 'Generating…'; $('bar').style.width = '5%';
  if (audioCtx) { audioCtx.close(); audioCtx = null; }
  const body = {input: text, language: $('language').value};
  if (mode === 'design') { body.mode = 'voice_design';
    body.instruct = instruct; }
  else body.voice = $('voice').value;
  const t0 = performance.now(); let first = null, carry = new Uint8Array(0);
  const blocks = [];
  try {
    const resp = await fetch('/v1/audio/speech', {method:'POST',
      headers:{'Content-Type':'application/json'},
      body: JSON.stringify(body)});
    if (!resp.ok) throw new Error('HTTP ' + resp.status);
    const rd = resp.body.getReader();
    while (true) {
      const {done, value} = await rd.read();
      if (done) break;
      if (first === null) { first = performance.now() - t0;
        $('status').textContent =
            'First audio in ' + first.toFixed(0) + ' ms — streaming…'; }
      let bytes = new Uint8Array(carry.length + value.length);
      bytes.set(carry); bytes.set(value, carry.length);
      const usable = bytes.length & ~1;
      carry = bytes.slice(usable);
      const i16 = new Int16Array(bytes.buffer, 0, usable >> 1);
      blocks.push(i16.slice());
      const f32 = new Float32Array(i16.length);
      for (let i = 0; i < i16.length; i++) f32[i] = i16[i] / 32768;
      schedule(f32);
      const secs = blocks.reduce((a,b)=>a+b.length,0) / 24000;
      $('bar').style.width = Math.min(95, 10 + secs * 6) + '%';
    }
    const secs = blocks.reduce((a,b)=>a+b.length,0) / 24000;
    $('status').textContent = secs.toFixed(1) + ' s of audio in ' +
        ((performance.now()-t0)/1000).toFixed(2) + ' s' +
        (first !== null ? ' (first chunk ' + first.toFixed(0) + ' ms)' : '');
    $('bar').style.width = '100%';
    $('player').src = URL.createObjectURL(wavBlob(blocks));
    $('player').style.display = '';
  } catch (e) {
    $('status').textContent = 'Error: ' + e.message;
  } finally { streaming = false; $('gen').disabled = false; }
}

window.addEventListener('DOMContentLoaded', () => {
  setTab('design'); loadVoices();
  $('gen').addEventListener('click', generate);
});
"""


def render_page() -> str:
    """Build the single-file UI page (no external assets, CSP-friendly)."""
    lang_opts = "\n".join(
        f'<option{" selected" if l == "English" else ""}>{l}</option>'
        for l in LANGUAGES
    )
    example_rows = "\n".join(
        f"<tr onclick='useExample(this)'><td>{t}</td><td>{i}</td><td>{l}</td></tr>"
        for t, i, l in EXAMPLES
    )
    return f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width,initial-scale=1">
<title>Qwen3-TTS Voice Design</title>
<style>{_CSS}</style></head>
<body><div class="wrap">
<h1>&#127908; Qwen3-TTS Voice Design</h1>
<div class="sub">Generate speech with custom voice characteristics using
natural language instructions. Describe the desired voice (gender, age,
tone, &hellip;) and the system synthesizes speech matching your
description &mdash; streamed live from the TPU engine.</div>

<div class="tabs">
  <button id="tab-design" class="on" onclick="setTab('design')">Voice Design</button>
  <button id="tab-custom" onclick="setTab('custom')">Custom Voice</button>
</div>

<div class="grid">
  <div class="card">
    <label for="text">Text to Synthesize</label>
    <textarea id="text" rows="3"
      placeholder="Enter the text you want to convert to speech...">Hello, this is a test of the voice design system.</textarea>
    <div id="row-instruct">
      <label for="instruct">Voice Design Instruction</label>
      <textarea id="instruct" rows="2"
        placeholder="Describe the desired voice (e.g., 'Male, 30 years old, deep voice')">Male, 35 years old, deep and authoritative voice</textarea>
    </div>
    <div id="row-voice" style="display:none">
      <label for="voice">Speaker</label>
      <select id="voice"></select>
    </div>
    <label for="language">Language</label>
    <select id="language">{lang_opts}</select>
    <button id="gen" class="primary">&#127925; Generate Speech</button>
    <div class="meter"><div id="bar"></div></div>
    <div id="status" class="status"></div>
  </div>
  <div class="card">
    <label>Generated Speech</label>
    <div class="sub" style="margin:4px 0 0">Audio plays as it streams;
    the player below holds the finished take for replay / download.</div>
    <audio id="player" controls style="display:none"></audio>
    <div class="examples"><label style="margin-top:18px">&#128221; Example
    Instructions <span style="color:var(--dim);font-weight:400">(click to
    load)</span></label>
    <table><tbody>{example_rows}</tbody></table></div>
  </div>
</div>

<details><summary>&#128161; Tips for Voice Instructions</summary>
<p><b>Basic format</b> &mdash; Gender: Male / Female &middot; Age: e.g.
<code>25 years old</code>, <code>middle-aged</code>, <code>elderly</code>
&middot; Tone: deep, soft, cheerful, calm, energetic, professional, &hellip;</p>
<p><b>Good examples</b></p>
<ul>
<li><code>Male, 30 years old, deep and authoritative voice</code></li>
<li><code>Female, 25 years old, soft and gentle voice</code></li>
<li><code>Male, 40 years old, calm and professional</code></li>
<li><code>Female, 20 years old, excited and enthusiastic</code></li>
</ul>
<p><b>Tips</b> &mdash; be specific about gender and age; include 1&ndash;2
descriptive adjectives for tone/style; keep instructions concise (1&ndash;2
sentences); experiment with different combinations!</p>
</details>

<script>{_JS}</script>
</div></body></html>"""
