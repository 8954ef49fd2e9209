package graft.meta

import scala.collection.mutable

/** Scoped out-of-band metadata ("tags") riding alongside a pipeline —
  * the reference's metadata subsystem (flod `metadata.d`), re-expressed
  * as a plain ordered store over the operator chain (SURVEY.md §1.4:
  * no Catalyst hook needed).
  *
  * Semantics (metadata.d:102-116 `gettersAt`, store 232-264):
  *  - stages occupy ordered positions in the chain (source = 0, …, sink);
  *  - a getter at position g sees the value written by the *nearest
  *    setter at position ≤ g* (last-setter-wins scoping);
  *  - `set` synchronously fires `onChange` on every downstream getter up
  *    to (not including) the next registered setter for that key, in
  *    chain order (pipeline.d:251-262).
  */
final class TagChain {

  private case class Getter(pos: Int, onChange: Option[Any => Unit])
  // key -> setter positions / getters / current values per setter position
  private val setters = mutable.Map.empty[String, mutable.SortedSet[Int]]
  private val getters = mutable.Map.empty[String, mutable.ArrayBuffer[Getter]]
  private val values  = mutable.Map.empty[(String, Int), Any]

  def registerSetter(pos: Int, key: String): Unit =
    setters.getOrElseUpdate(key, mutable.SortedSet.empty[Int]) += pos

  def registerGetter(pos: Int, key: String, onChange: Option[Any => Unit] = None): Unit =
    getters.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += Getter(pos, onChange)

  /** Set `key` from the stage at `pos` (must be a registered setter) and
    * notify the getters scoped to this setter, in chain order. */
  def set(pos: Int, key: String, value: Any): Unit = {
    require(setters.get(key).exists(_.contains(pos)),
      s"stage $pos is not a registered setter for tag '$key'")
    values((key, pos)) = value
    val nextSetter = setters(key).rangeFrom(pos + 1).headOption.getOrElse(Int.MaxValue)
    getters.getOrElse(key, Nil).toSeq
      .filter(g => g.pos >= pos && g.pos < nextSetter)
      .sortBy(_.pos)
      .foreach(g => g.onChange.foreach(_(value)))
  }

  /** Read `key` as seen from stage `pos`: nearest upstream setter's value. */
  def get(pos: Int, key: String): Option[Any] =
    setters.get(key).toSeq
      .flatMap(_.rangeTo(pos).toSeq.reverse)
      .flatMap(sp => values.get((key, sp)))
      .headOption
}
