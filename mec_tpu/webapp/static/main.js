// Dependency-free horizontal bar charts for .chart[data-labels][data-values]
// (the reference pulls Chart.js from a CDN; this image has no egress).
// Bars are colored per emotion via the emotion-<name> CSS custom props.
document.querySelectorAll('.chart').forEach(function (el) {
  var labels, values;
  try {
    labels = JSON.parse(el.dataset.labels || '[]');
    values = JSON.parse(el.dataset.values || '[]');
  } catch (e) { return; }
  if (!labels.length) return;
  var max = Math.max.apply(null, values.concat([1e-9]));
  labels.forEach(function (label, i) {
    var row = document.createElement('div');
    row.className = 'bar-row';
    var name = document.createElement('span');
    name.className = 'bar-label';
    name.textContent = label;
    var track = document.createElement('div');
    track.className = 'bar-track';
    var bar = document.createElement('div');
    bar.className = 'bar emotion-' + String(label).toLowerCase();
    bar.style.width = (100 * (values[i] || 0) / max) + '%';
    track.appendChild(bar);
    var val = document.createElement('span');
    val.className = 'bar-val';
    val.textContent = (values[i] <= 1 && max <= 1)
      ? (100 * values[i]).toFixed(1) + '%' : String(values[i]);
    row.appendChild(name); row.appendChild(track); row.appendChild(val);
    el.appendChild(row);
  });
});
