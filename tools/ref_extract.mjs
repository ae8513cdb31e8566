// Batch runner for the reference: JSON array of HTML strings on stdin →
// JSON array of {status, result?} on the LAST stdout line (clock noise from
// the fork is swallowed).
import path from "path";
import { createRequire } from "module";

const require = createRequire(import.meta.url);
const REF = "/root/reference";
const { Readability, JSDOMParser } = require(path.join(REF, "index.js"));

const URI = "http://fakehost/test/page.html";
const OPTS = { classesToPreserve: ["caption"] };

const realLog = console.log;
console.log = () => {};

function runOne(source, opts = OPTS) {
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
    if (String(e && e.message).includes("Aborting parsing document"))
      return { status: "too_large" };
    return { status: "error" };
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

let input = "";
process.stdin.setEncoding("utf8");
process.stdin.on("data", d => (input += d));
process.stdin.on("end", () => {
  const cases = JSON.parse(input);
  const out = cases.map(c =>
    typeof c === "string" ? runOne(c) : runOne(c.html, c.opts ?? OPTS));
  console.log = realLog;
  process.stdout.write("\n" + JSON.stringify(out) + "\n");
});
