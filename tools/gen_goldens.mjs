// Golden generator: run the reference (read-only at /root/reference) over its own
// fixture corpus + edge-case snippets, write JSON goldens for pytest equality.
// Mirrors test/test-readability.js:261-280 (uri, classesToPreserve, errorState rules)
// and test/utils.js:5-7 (trimmed source). Uses the parse() RETURN VALUE only —
// the fork prints clock noise to stdout (Readability.js:2227-2230).
import fs from "fs";
import path from "path";
import { createRequire } from "module";

const require = createRequire(import.meta.url);
const REF = "/root/reference";
const { Readability, JSDOMParser } = require(path.join(REF, "index.js"));

const URI = "http://fakehost/test/page.html";
const OPTS = { classesToPreserve: ["caption"] };

// Silence the fork's clock console noise so any stdout from us stays clean.
const realLog = console.log;
console.log = () => {};

function runOne(source, opts = OPTS) {
  // Returns {status, result} mirroring the harness + kernel status contract.
  const parser = new JSDOMParser();
  let doc;
  try {
    doc = parser.parse(source, URI);
  } catch (e) {
    return { status: "parse_error", error: String(e && e.message) };
  }
  if (parser.errorState) {
    return { status: "parse_error", error: String(parser.errorState).slice(0, 500) };
  }
  let reader;
  try {
    reader = new Readability(doc, opts);
  } catch (e) {
    return { status: "no_document", error: String(e && e.message) };
  }
  let result;
  try {
    result = reader.parse();
  } catch (e) {
    return { status: "error", error: String(e && e.message).slice(0, 500) };
  }
  if (!result) {
    return { status: "null_result" };
  }
  return {
    status: "ok",
    result: {
      title: result.title ?? null,
      byline: result.byline ?? null,
      dir: result.dir ?? null,
      content: result.content ?? null,
      text_content: result.textContent ?? null,
      length: result.length ?? null,
      excerpt: result.excerpt ?? null,
      site_name: result.siteName ?? null,
    },
  };
}

const pagesDir = path.join(REF, "test", "test-pages");
const outDir = process.argv[2] || "/root/repo/tests/goldens";
fs.mkdirSync(outDir, { recursive: true });

const index = [];
for (const slug of fs.readdirSync(pagesDir).sort()) {
  const dir = path.join(pagesDir, slug);
  if (!fs.statSync(dir).isDirectory()) continue;
  const source = fs.readFileSync(path.join(dir, "source.html"), "utf-8").trim();
  const meta = JSON.parse(
    fs.readFileSync(path.join(dir, "expected-metadata.json"), "utf-8")
  );
  const out = runOne(source);
  out.slug = slug;
  out.readerable = !!meta.readerable;
  fs.writeFileSync(path.join(outDir, slug + ".json"), JSON.stringify(out));
  index.push({ slug, status: out.status, readerable: out.readerable });
}

// Edge-case snippets (FIXTURES.md §1): statuses must match live reference behavior.
const edges = {
  "edge-fragment": "<div><p>Just a fragment without html element.</p></div>",
  "edge-no-body": "<html><div>No body element here at all.</div></html>",
  "edge-script-lt":
    "<html><body><script>if(x<4){go()}</script><p>body text</p></body></html>",
  "edge-empty": "",
  "edge-plain-html": [
    "<html><head><title>Tiny page: a test</title></head><body><div id=\"main\">",
    Array.from({ length: 30 }, (_, i) =>
      `<p>Paragraph ${i} with some, commas, and enough length to score well in the readability algorithm, yes indeed it keeps going and going.</p>`
    ).join(""),
    "</div></body></html>",
  ].join(""),
};
for (const [slug, src] of Object.entries(edges)) {
  const out = runOne(src);
  out.slug = slug;
  fs.writeFileSync(path.join(outDir, slug + ".json"), JSON.stringify(out));
  index.push({ slug, status: out.status });
}

fs.writeFileSync(path.join(outDir, "_index.json"), JSON.stringify(index, null, 1));
console.log = realLog;
console.log(
  "wrote",
  index.length,
  "goldens;",
  index.filter(x => x.status === "ok").length,
  "ok"
);
