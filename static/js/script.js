/* IndexTTS-TPU single-page app: synthesis with SSE progress, saved voices,
 * regex rulesets, history. Talks to the REST surface of server/webui.py. */

const $ = (id) => document.getElementById(id);

let lastUploadIdentifier = null; // server-side cache key for save-voice-feature
let currentEventSource = null;

// ---------------------------------------------------------------------------
// rulesets
// ---------------------------------------------------------------------------

async function loadRulesets() {
  const res = await fetch("/api/rulesets");
  const names = await res.json();
  const sel = $("ruleset-select");
  const cur = sel.value;
  sel.innerHTML = '<option value="">(none)</option>';
  for (const n of names) {
    const opt = document.createElement("option");
    opt.value = n;
    opt.textContent = n;
    sel.appendChild(opt);
  }
  sel.value = cur;
}

function ruleRow(original = "", replacement = "") {
  // build via DOM + .value (never innerHTML interpolation): rules are
  // arbitrary regex text — entity sequences like "&nbsp;" must round-trip
  // byte-exact, and attribute escaping is easy to get wrong
  const row = document.createElement("div");
  row.className = "rule-row";
  const orig = document.createElement("input");
  orig.className = "rule-original";
  orig.placeholder = "正则 regex";
  orig.value = original;
  const repl = document.createElement("input");
  repl.className = "rule-replacement";
  repl.placeholder = "替换 replacement";
  repl.value = replacement;
  const del = document.createElement("button");
  del.className = "ghost danger rule-del";
  del.textContent = "×";
  del.onclick = () => row.remove();
  row.append(orig, repl, del);
  return row;
}

function currentRules() {
  return [...document.querySelectorAll("#rules-list .rule-row")].map((row) => ({
    original: row.querySelector(".rule-original").value,
    replacement: row.querySelector(".rule-replacement").value,
  })).filter((r) => r.original);
}

$("ruleset-edit-btn").onclick = () => $("ruleset-editor").classList.toggle("hidden");
$("rule-add-btn").onclick = () => $("rules-list").appendChild(ruleRow());

$("ruleset-select").onchange = async () => {
  const name = $("ruleset-select").value;
  $("rules-list").innerHTML = "";
  if (!name) {
    // clear the stale name too — otherwise Save after picking "(none)"
    // would overwrite the previously-loaded ruleset with an empty list
    $("ruleset-name").value = "";
    return;
  }
  const res = await fetch(`/api/rulesets/${encodeURIComponent(name)}`);
  if (!res.ok) return;
  const rules = await res.json();
  $("ruleset-name").value = name;
  for (const r of rules) $("rules-list").appendChild(ruleRow(r.original, r.replacement));
};

$("ruleset-save-btn").onclick = async () => {
  const name = $("ruleset-name").value.trim();
  if (!name) return alert("需要规则集名称 / ruleset name required");
  const res = await fetch("/api/rulesets", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ name, rules: currentRules() }),
  });
  const out = await res.json();
  await loadRulesets();
  // the server stores under the SANITIZED name ("my rules" -> "my-rules");
  // select what it actually saved or the dropdown silently deselects
  $("ruleset-select").value = (out && out.filename) || name;
};

$("ruleset-delete-btn").onclick = async () => {
  const name = $("ruleset-select").value;
  if (!name || !confirm(`删除规则集 "${name}"?`)) return;
  await fetch(`/api/rulesets/${encodeURIComponent(name)}`, { method: "DELETE" });
  $("rules-list").innerHTML = "";
  await loadRulesets();
};

// ---------------------------------------------------------------------------
// voices
// ---------------------------------------------------------------------------

async function loadVoices() {
  const res = await fetch("/api/saved-voices");
  const voices = await res.json();
  const sel = $("saved-voice-select");
  const cur = sel.value;
  sel.innerHTML = '<option value="">(上传新音频 upload new)</option>';
  for (const v of voices) {
    const opt = document.createElement("option");
    opt.value = v.id;
    opt.textContent = v.name;
    sel.appendChild(opt);
  }
  sel.value = cur;
}

// ONE sync function for the voice-source UI state: several code paths set
// saved-voice-select.value programmatically (file pick, voice save, voice
// delete/reload), and programmatic .value changes never fire onchange
function updateVoiceSourceUI() {
  const usingSaved = !!$("saved-voice-select").value;
  $("upload-zone").style.opacity = usingSaved ? 0.4 : 1;
}

$("saved-voice-select").onchange = updateVoiceSourceUI;

$("voice-delete-btn").onclick = async () => {
  const id = $("saved-voice-select").value;
  if (!id || !confirm(`删除声音 "${id}"?`)) return;
  await fetch(`/api/saved-voices/${encodeURIComponent(id)}`, { method: "DELETE" });
  await loadVoices();
  updateVoiceSourceUI();
};

// ---------------------------------------------------------------------------
// waveform display + drag-to-crop (parity with the reference UI's waveform)
// ---------------------------------------------------------------------------

let waveDuration = 0;
let dragStart = null;
// decode cache + shared context: browsers cap live AudioContexts (~6 in
// Chrome) and every crop tweak redraws — a fresh context per draw would
// kill the waveform UI after a few adjustments, and re-decoding the same
// file on every overlay change is wasted work
let sharedAudioCtx = null;
let decodedWave = { file: null, audio: null };

async function decodeForWaveform(file) {
  if (decodedWave.file === file) return decodedWave.audio;
  if (!sharedAudioCtx) {
    sharedAudioCtx = new (window.AudioContext || window.webkitAudioContext)();
  }
  const buf = await file.arrayBuffer();
  const audio = await sharedAudioCtx.decodeAudioData(buf);
  decodedWave = { file, audio };
  return audio;
}

async function drawWaveform(file) {
  const canvas = $("waveform");
  const ctx2d = canvas.getContext("2d");
  try {
    const audio = await decodeForWaveform(file);
    waveDuration = audio.duration;
    const data = audio.getChannelData(0);
    const w = canvas.width, h = canvas.height;
    ctx2d.clearRect(0, 0, w, h);
    ctx2d.fillStyle = "#10131b";
    ctx2d.fillRect(0, 0, w, h);
    ctx2d.strokeStyle = "#4f8cff";
    ctx2d.beginPath();
    const step = Math.max(1, Math.floor(data.length / w));
    for (let x = 0; x < w; x++) {
      let min = 1, max = -1;
      for (let i = x * step; i < (x + 1) * step && i < data.length; i++) {
        if (data[i] < min) min = data[i];
        if (data[i] > max) max = data[i];
      }
      ctx2d.moveTo(x, (1 - max) * h / 2);
      ctx2d.lineTo(x, (1 - min) * h / 2);
    }
    ctx2d.stroke();
    drawCropOverlay();
    canvas.classList.remove("hidden");
  } catch (e) {
    canvas.classList.add("hidden");
  }
}

function drawCropOverlay() {
  const canvas = $("waveform");
  if (!waveDuration) return;
  const ctx2d = canvas.getContext("2d");
  const s = parseFloat($("crop-start").value) || 0;
  const e = parseFloat($("crop-end").value) || waveDuration;
  const x0 = (s / waveDuration) * canvas.width;
  const x1 = (e / waveDuration) * canvas.width;
  ctx2d.fillStyle = "rgba(79, 140, 255, 0.18)";
  ctx2d.fillRect(x0, 0, Math.max(x1 - x0, 1), canvas.height);
}

$("waveform").addEventListener("mousedown", (ev) => {
  if (!waveDuration) return;
  const rect = $("waveform").getBoundingClientRect();
  dragStart = ((ev.clientX - rect.left) / rect.width) * waveDuration;
});
// mouseup on document, not the canvas: a drag released off-canvas must
// finish (clamped) rather than leave a stale dragStart that pairs with an
// unrelated later click and sets a bogus crop range
document.addEventListener("mouseup", (ev) => {
  if (dragStart === null || !waveDuration) return;
  const rect = $("waveform").getBoundingClientRect();
  const frac = Math.min(1, Math.max(0, (ev.clientX - rect.left) / rect.width));
  const end = frac * waveDuration;
  $("crop-start").value = Math.min(dragStart, end).toFixed(2);
  $("crop-end").value = Math.max(dragStart, end).toFixed(2);
  dragStart = null;
  const file = $("reference-audio").files[0];
  if (file) drawWaveform(file);
});
$("crop-start").addEventListener("change", () => {
  const f = $("reference-audio").files[0];
  if (f) drawWaveform(f);
});
$("crop-end").addEventListener("change", () => {
  const f = $("reference-audio").files[0];
  if (f) drawWaveform(f);
});

$("reference-audio").onchange = () => {
  const file = $("reference-audio").files[0];
  if (file) {
    const prev = $("reference-preview").src;
    if (prev && prev.startsWith("blob:")) URL.revokeObjectURL(prev);
    const url = URL.createObjectURL(file);
    $("reference-preview").src = url;
    $("reference-preview").classList.remove("hidden");
    $("saved-voice-select").value = "";
    updateVoiceSourceUI();
    $("crop-start").value = "";
    $("crop-end").value = "";
    drawWaveform(file);
  }
};

$("voice-save-btn").onclick = async () => {
  const name = $("voice-save-name").value.trim();
  if (!name) return alert("需要声音名称 / voice name required");
  if (!lastUploadIdentifier) return alert("请先用上传的音频合成一次 / synthesize with the upload first");
  const res = await fetch("/api/save-voice-feature", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ name, source_reference_identifier: lastUploadIdentifier }),
  });
  const out = await res.json();
  if (!res.ok) return alert(out.error || "保存失败");
  lastUploadIdentifier = null;
  $("voice-save-btn").disabled = true;
  await loadVoices();
  $("saved-voice-select").value = out.id;
  updateVoiceSourceUI();
};

// ---------------------------------------------------------------------------
// synthesis
// ---------------------------------------------------------------------------

function setProgress(pct, msg) {
  $("progress-wrap").classList.remove("hidden");
  if (pct !== null) $("progress-fill").style.width = `${pct}%`; // null: keep bar, update msg only
  $("progress-msg").textContent = msg || "";
}

// ---------------------------------------------------------------------------
// streaming playback: POST /api/synthesize-stream returns a chunked WAV whose
// PCM arrives as the decoder produces codes; play it progressively through
// Web Audio (16-bit mono 24 kHz is known a priori, so chunks are decoded by
// hand and scheduled back-to-back), then assemble the finished WAV for the
// result player/download.
async function synthesizeStreaming(form) {
  const res = await fetch("/api/synthesize-stream", { method: "POST", body: form });
  if (!res.ok) {
    let msg = "stream failed";
    try { msg = (await res.json()).error || msg; } catch (e) {}
    throw new Error(msg);
  }
  const sr = 24000;
  // browsers cap live AudioContexts per page (~6 in Chrome): always close
  // this one when the stream ends or fails, after scheduled audio drains
  const ctx = new (window.AudioContext || window.webkitAudioContext)({ sampleRate: sr });
  const reader = res.body.getReader();
  const allChunks = [];
  let header = 44; // RIFF header bytes to skip
  let carry = new Uint8Array(0);
  let nextTime = ctx.currentTime + 0.05;
  let samplesStreamed = 0;
  try {
  for (;;) {
    const { value, done } = await reader.read();
    if (done) break;
    allChunks.push(value);
    let buf = value;
    if (header > 0) {
      const drop = Math.min(header, buf.length);
      header -= drop;
      buf = buf.subarray(drop);
    }
    if (carry.length) {
      const merged = new Uint8Array(carry.length + buf.length);
      merged.set(carry); merged.set(buf, carry.length);
      buf = merged; carry = new Uint8Array(0);
    }
    const usable = buf.length - (buf.length % 2);
    if (buf.length % 2) carry = buf.subarray(usable);
    if (!usable) continue;
    const pcm = new Int16Array(buf.buffer.slice(buf.byteOffset, buf.byteOffset + usable));
    const audioBuf = ctx.createBuffer(1, pcm.length, sr);
    const ch = audioBuf.getChannelData(0);
    for (let i = 0; i < pcm.length; i++) ch[i] = pcm[i] / 32768;
    const src = ctx.createBufferSource();
    src.buffer = audioBuf;
    src.connect(ctx.destination);
    if (nextTime < ctx.currentTime) nextTime = ctx.currentTime + 0.02;
    src.start(nextTime);
    nextTime += audioBuf.duration;
    samplesStreamed += pcm.length;
    setProgress(Math.min(99, 100 * samplesStreamed / (sr * 30)),
                `流式播放中 streaming… ${(samplesStreamed / sr).toFixed(1)}s`);
  }
  } finally {
    const drainMs = Math.max(0, (nextTime - ctx.currentTime) * 1000) + 200;
    setTimeout(() => { try { ctx.close(); } catch (e) {} }, drainMs);
  }
  if (samplesStreamed === 0) {
    // the server streams the RIFF header before synthesis starts, so an
    // engine failure mid-stream just ends the body: a header-only response
    // is an error, not a completed 0-second synthesis
    throw new Error("服务端未产生音频 no audio streamed (server-side failure?)");
  }
  // assemble a well-formed WAV (fix the max-size RIFF lengths) for replay
  const total = allChunks.reduce((n, c) => n + c.length, 0);
  const out = new Uint8Array(total);
  let off = 0;
  for (const c of allChunks) { out.set(c, off); off += c.length; }
  const dataLen = Math.max(0, total - 44);
  const dv = new DataView(out.buffer);
  dv.setUint32(4, 36 + dataLen, true);
  dv.setUint32(40, dataLen, true);
  return new Blob([out], { type: "audio/wav" });
}

$("synthesize-btn").onclick = async () => {
  const text = $("text-input").value.trim();
  if (!text) return alert("文本为空 / text is empty");

  const mode = document.querySelector('input[name="infer-mode"]:checked').value;
  const form = new FormData();
  form.append("text", text);
  form.append("infer_mode", mode);
  form.append("do_sample", $("p-do-sample").checked);
  form.append("temperature", $("p-temperature").value);
  form.append("top_k", $("p-top-k").value);
  form.append("top_p", $("p-top-p").value);
  form.append("repetition_penalty", $("p-rep-pen").value);
  form.append("num_beams", $("p-num-beams").value);
  form.append("length_penalty", $("p-len-pen").value);
  form.append("max_mel_tokens", $("p-max-mel").value);
  // a cleared number input submits "" — omit it so the server default
  // applies instead of failing the task on int("")
  if ($("p-max-text").value) {
    form.append("max_text_tokens_per_sentence", $("p-max-text").value);
  }
  form.append("replacements", JSON.stringify(currentRules()));

  const savedVoice = $("saved-voice-select").value;
  if (savedVoice) {
    form.append("saved_voice_identifier", savedVoice);
  } else {
    const file = $("reference-audio").files[0];
    if (!file) return alert("需要参考音频或已保存声音 / reference audio or saved voice required");
    form.append("referenceAudioFile", file);
    if ($("crop-start").value) form.append("cropStart", $("crop-start").value);
    if ($("crop-end").value) form.append("cropEnd", $("crop-end").value);
  }

  $("synthesize-btn").disabled = true;
  $("result").classList.add("hidden");
  setProgress(0, "提交任务 submitting…");

  if (mode === "流式") {
    try {
      const blob = await synthesizeStreaming(form);
      // revoke the previous streamed result or its WAV blob stays pinned in
      // memory for the page lifetime (same leak class as reference-preview)
      const prevResult = $("result-audio").src;
      if (prevResult && prevResult.startsWith("blob:")) URL.revokeObjectURL(prevResult);
      const url = URL.createObjectURL(blob);
      $("result").classList.remove("hidden");
      $("result-audio").src = url;
      $("result-download").href = url;
      $("result-download").download = "stream.wav";
      setProgress(100, "完成 completed (streamed)");
    } catch (e) {
      setProgress(0, `错误: ${e.message}`);
    } finally {
      $("synthesize-btn").disabled = false;
    }
    return;
  }

  try {
    const res = await fetch("/api/synthesize", { method: "POST", body: form });
    const out = await res.json();
    if (!res.ok) throw new Error(out.error || "synthesize failed");
    watchTask(out.task_id, !savedVoice);
  } catch (e) {
    setProgress(0, `错误: ${e.message}`);
    $("synthesize-btn").disabled = false;
  }
};

function watchTask(taskId, fromUpload) {
  if (currentEventSource) currentEventSource.close();
  const es = new EventSource(`/api/synthesize-stream-status/${taskId}`);
  currentEventSource = es;
  es.onmessage = (ev) => {
    const info = JSON.parse(ev.data);
    setProgress(info.progress || 0, info.message || info.status || "");
    if (info.status === "completed") {
      es.close();
      $("synthesize-btn").disabled = false;
      $("result").classList.remove("hidden");
      const prevResult = $("result-audio").src;
      if (prevResult && prevResult.startsWith("blob:")) URL.revokeObjectURL(prevResult);
      $("result-audio").src = `${info.audio_url}?t=${Date.now()}`;
      $("result-download").href = info.audio_url;
      $("result-download").download = info.download_filename || "synthesis.wav";
      if (fromUpload && info.source_reference_identifier_for_save) {
        lastUploadIdentifier = info.source_reference_identifier_for_save;
        $("voice-save-btn").disabled = false;
      } else if (fromUpload) {
        $("voice-save-btn").disabled = false;
      }
      loadHistory();
    } else if (info.status === "failed" || info.status === "error") {
      es.close();
      $("synthesize-btn").disabled = false;
    } else if (fromUpload && info.source_reference_identifier_for_save && !lastUploadIdentifier) {
      lastUploadIdentifier = info.source_reference_identifier_for_save;
    }
  };
  es.onerror = () => {
    // transient blips: EventSource reconnects on its own, and the server
    // keeps the task for reconnecting clients (webui._reap_stale_tasks) —
    // closing here would freeze progress and invite a duplicate submit.
    // Only a CLOSED readyState means the browser has given up for good.
    if (es.readyState === EventSource.CLOSED) {
      $("synthesize-btn").disabled = false;
      setProgress(0, "连接中断 connection lost — task may still complete (see history)");
    } else {
      setProgress(null, "重新连接 reconnecting…");
    }
  };
}

// ---------------------------------------------------------------------------
// history
// ---------------------------------------------------------------------------

async function loadHistory() {
  const res = await fetch("/api/history-audios");
  const items = await res.json();
  const ul = $("history-list");
  ul.innerHTML = "";
  for (const item of items) {
    // DOM construction, not innerHTML interpolation: outputs/ is a plain
    // shared directory, so file names are not guaranteed attribute-safe
    const li = document.createElement("li");
    const name = document.createElement("span");
    name.className = "name";
    name.title = item.name;
    name.textContent = item.name;
    const date = document.createElement("span");
    date.className = "date";
    date.textContent = item.date;
    const play = document.createElement("button");
    play.className = "ghost play";
    play.textContent = "▶";
    const dl = document.createElement("a");
    dl.className = "ghost";
    dl.href = item.url;
    dl.setAttribute("download", "");
    dl.textContent = "⬇";
    const del = document.createElement("button");
    del.className = "ghost danger del";
    del.textContent = "×";
    li.append(name, date, play, dl, del);
    li.querySelector(".play").onclick = () => {
      $("result").classList.remove("hidden");
      $("result-audio").src = `${item.url}?t=${Date.now()}`;
      $("result-audio").play();
    };
    li.querySelector(".del").onclick = async () => {
      if (!confirm(`删除 "${item.name}"?`)) return;
      await fetch("/api/delete-audio", {
        method: "DELETE",
        headers: { "Content-Type": "application/json" },
        body: JSON.stringify({ filename: item.name }),
      });
      loadHistory();
    };
    ul.appendChild(li);
  }
}

// boot
loadRulesets();
loadVoices();
loadHistory();
