// Frontend for the TPU segmentation demo.
// Capability parity with the reference webapp frontend
// (segmentation_webapp/static/script.js): image/label upload, model
// selection, single-point prompt picked on a canvas and scaled from
// display to ORIGINAL image coordinates, 3-panel display, dynamic legend.

const COLORS = ["#000000", "#ff0000", "#00ff00", "#0000ff"];

const state = {
  imageDataUrl: null,
  labelDataUrl: null,
  imageW: 0,
  imageH: 0,
  point: null, // {x, y} in original image coords
  model: null,
};

const canvas = document.getElementById("input-canvas");
const ctx = canvas.getContext("2d");
const statusEl = document.getElementById("status");
const segmentBtn = document.getElementById("segment-btn");

async function loadModels() {
  const res = await fetch("/models");
  const data = await res.json();
  const fs = document.getElementById("model-choices");
  data.models.forEach((name, i) => {
    const label = document.createElement("label");
    const input = document.createElement("input");
    input.type = "radio";
    input.name = "model";
    input.value = name;
    if (i === 0) {
      input.checked = true;
      state.model = name;
    }
    input.addEventListener("change", () => (state.model = name));
    label.appendChild(input);
    label.appendChild(document.createTextNode(" " + name));
    fs.appendChild(label);
  });
}

function redraw() {
  if (!state.imageDataUrl) return;
  const img = new Image();
  img.onload = () => {
    state.imageW = img.naturalWidth;
    state.imageH = img.naturalHeight;
    canvas.width = img.naturalWidth;
    canvas.height = img.naturalHeight;
    ctx.drawImage(img, 0, 0);
    if (state.point) {
      ctx.fillStyle = "rgba(255, 215, 0, 0.9)";
      ctx.beginPath();
      ctx.arc(state.point.x, state.point.y, Math.max(4, canvas.width / 60), 0, 2 * Math.PI);
      ctx.fill();
      ctx.strokeStyle = "#333";
      ctx.stroke();
    }
  };
  img.src = state.imageDataUrl;
}

document.getElementById("image-input").addEventListener("change", (e) => {
  const file = e.target.files[0];
  if (!file) return;
  const reader = new FileReader();
  reader.onload = () => {
    state.imageDataUrl = reader.result;
    state.point = null;
    segmentBtn.disabled = false;
    redraw();
  };
  reader.readAsDataURL(file);
});

document.getElementById("label-input").addEventListener("change", (e) => {
  const file = e.target.files[0];
  if (!file) return;
  const reader = new FileReader();
  reader.onload = () => (state.labelDataUrl = reader.result);
  reader.readAsDataURL(file);
});

// Click → original-image coordinates (canvas is displayed scaled via CSS,
// so scale from client rect to the canvas's intrinsic = original size).
canvas.addEventListener("click", (e) => {
  if (!state.imageDataUrl) return;
  const rect = canvas.getBoundingClientRect();
  const x = ((e.clientX - rect.left) / rect.width) * canvas.width;
  const y = ((e.clientY - rect.top) / rect.height) * canvas.height;
  state.point = { x: Math.round(x), y: Math.round(y) };
  redraw();
});

document.getElementById("clear-btn").addEventListener("click", () => {
  state.point = null;
  redraw();
});

function renderLegend(classNames) {
  const el = document.getElementById("legend");
  el.innerHTML = "";
  classNames.forEach((name, i) => {
    const item = document.createElement("span");
    item.className = "legend-item";
    const sw = document.createElement("span");
    sw.className = "legend-swatch";
    sw.style.background = COLORS[i % COLORS.length];
    item.appendChild(sw);
    item.appendChild(document.createTextNode(name));
    el.appendChild(item);
  });
}

segmentBtn.addEventListener("click", async () => {
  if (!state.imageDataUrl || !state.model) return;
  statusEl.textContent = "segmenting…";
  segmentBtn.disabled = true;
  const payload = {
    image: state.imageDataUrl,
    model: state.model,
  };
  if (state.point) {
    payload.prompt_type = "points";
    payload.prompt_data = [state.point];
  }
  if (state.labelDataUrl) payload.label = state.labelDataUrl;
  try {
    const res = await fetch("/segment", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(payload),
    });
    const data = await res.json();
    if (data.error) {
      statusEl.textContent = "error: " + data.error;
      return;
    }
    document.getElementById("output-mask").src =
      "data:image/png;base64," + data.output_mask;
    if (data.output_label) {
      document.getElementById("output-label").src =
        "data:image/png;base64," + data.output_label;
    }
    renderLegend(data.class_names);
    statusEl.textContent = "done";
  } catch (err) {
    statusEl.textContent = "request failed: " + err;
  } finally {
    segmentBtn.disabled = false;
  }
});

loadModels();
