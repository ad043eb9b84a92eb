package graft.streaming

/** ClickEvent fixture row (FIXTURES.md §1), shared by the streaming
  * specs. Top-level on purpose: a spec-nested case class forces the
  * generated encoder to reference the spec instance through an outer
  * accessor Janino cannot compile, so every streaming run logged
  * codegen `compilerError` stacks before falling back to interpreted
  * encoders — test-only noise, but hundreds of lines of it per run.
  */
case class CE(
    ip: String, eventtimestamp: Long, devicetype: String,
    event_type: String, product_type: String, userid: Int,
    globalseq: Long, prevglobalseq: Long)
