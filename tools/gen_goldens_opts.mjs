// Option-variant goldens: run the reference over the fixture corpus with
// non-default options, exercising the charThreshold retry ladder,
// nbTopCandidates, keepClasses and maxElemsToParse plumbing.
// Output: tests/goldens/opts/<variant>/<slug>.json
import fs from "fs";
import path from "path";
import { createRequire } from "module";

const require = createRequire(import.meta.url);
const REF = "/root/reference";
const { Readability, JSDOMParser } = require(path.join(REF, "index.js"));
const URI = "http://fakehost/test/page.html";

console.log = () => {};
const realLog = process.stdout.write.bind(process.stdout);

const VARIANTS = {
  "char100": { charThreshold: 100 },
  "char5000": { charThreshold: 5000 },
  "top2": { nbTopCandidates: 2 },
  "keepclasses": { keepClasses: true },
  "max500": { maxElemsToParse: 500 },
};

function runOne(source, opts) {
  const parser = new JSDOMParser();
  let doc;
  try {
    doc = parser.parse(source, URI);
  } catch (e) {
    return { status: "parse_error" };
  }
  if (parser.errorState) return { status: "parse_error" };
  let reader;
  try {
    reader = new Readability(doc, opts);
  } catch (e) {
    return { status: "no_document" };
  }
  let result;
  try {
    result = reader.parse();
  } catch (e) {
    return {
      status: String(e && e.message).includes("Aborting parsing document")
        ? "too_large"
        : "error",
    };
  }
  if (!result) return { status: "null_result" };
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
const outRoot = "/root/repo/tests/goldens/opts";
// Every 3rd fixture keeps the suite fast while covering the corpus spread.
const slugs = fs.readdirSync(pagesDir).sort().filter((_s, i) => i % 3 === 0);

let total = 0;
for (const [variant, opts] of Object.entries(VARIANTS)) {
  const dir = path.join(outRoot, variant);
  fs.mkdirSync(dir, { recursive: true });
  for (const slug of slugs) {
    const source = fs
      .readFileSync(path.join(pagesDir, slug, "source.html"), "utf-8")
      .trim();
    const out = runOne(source, opts);
    fs.writeFileSync(path.join(dir, slug + ".json"), JSON.stringify(out));
    total++;
  }
}
fs.writeFileSync(
  path.join(outRoot, "_variants.json"),
  JSON.stringify({ variants: VARIANTS, slugs })
);
realLog(`wrote ${total} option-variant goldens\n`);
