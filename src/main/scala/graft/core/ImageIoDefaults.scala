package graft.core

/** JVM-wide ImageIO configuration, owned in ONE place (ADVICE r18:
  * the `setUseCache(false)` call was previously duplicated across six
  * codec object initializers, relying on class-init order and hiding
  * the process-global effect).
  *
  * ImageIO defaults to DISK-backed stream caching: every bare
  * `ImageIO.read/write` spools the stream through a temp FILE. For
  * KB-sized in-memory payloads that is a file create+delete per row —
  * single-threaded it adds ~ms each, and a 32-way decode spread turns
  * it into filesystem contention (r18, guide §1.1: the stage time was
  * I/O syscalls, not decode). Keeping streams in memory is the right
  * default for every graft codec (payloads are KB-sized byte arrays).
  *
  * JVM-WIDE EFFECT: this disables disk-backed stream caching for any
  * other ImageIO user in the same JVM. A co-resident component that
  * decodes very large images from streams would buffer them fully in
  * heap; if that ever matters, scope the setting per-reader with
  * `MemoryCacheImageInputStream` instead of this global. */
object ImageIoDefaults {
  javax.imageio.ImageIO.setUseCache(false)

  /** Idempotent trigger: referencing this from a codec's initializer
    * forces this object's one-time init above. */
  def ensure(): Unit = ()
}
