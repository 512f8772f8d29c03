package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native, codegen'd predicate — the
  * manual form of the runtime-filter / semi-join-reduction pattern
  * (SURVEY §2.2 join family; builder north star "minimize shuffles").
  *
  * Why it exists: when a big fact table is semi-joined against a
  * filtered dimension that is too large to broadcast as a hash
  * relation, the fact side still has to shuffle EVERY row to the join.
  * A Bloom filter built over the dimension keys is orders of magnitude
  * smaller than the hash relation (bits, not rows), ships to every
  * task as one reference object, and eliminates the non-matching fact
  * rows AT THE SCAN — only candidates (matches + fpp false positives)
  * reach the exchange. False negatives are impossible, so a real join
  * above the filter restores exact semantics; the filter only prunes.
  *
  * The filter itself is built distributed (`DataFrameStatFunctions
  * .bloomFilter` — a treeAggregate over the dimension) and carried
  * here as its serialized bytes; deserialization happens once per
  * executor via the expression's lazy field, and codegen references
  * the deserialized object directly (`ctx.addReferenceObj`, same
  * pattern as Spark's own injected runtime filters).
  */
object BloomExpr {

  /** `BLOOM_MIGHT_CONTAIN_LONG(key, filterBytes)` — true iff the long
    * key is possibly in the set the filter was built over. No false
    * negatives; false-positive rate is the `fpp` the builder chose.
    */
  case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression with Predicate {

    override def prettyName: String = "bloom_might_contain_long"

    @transient private lazy val bf: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

    override protected def nullSafeEval(v: Any): Any =
      bf.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // one deserialized filter per plan, shared by reference across
      // all generated code that uses this expression instance
      val bfRef = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
      defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
      copy(child = newChild)
  }

  /** Column-API entry: build the filter with `df.stat.bloomFilter(col,
    * expectedItems, fpp)`, serialize with [[serialize]], and apply the
    * predicate to the probe column.
    */
  def mightContainLong(key: Column, filterBytes: Array[Byte]): Column =
    call_function("bloom_might_contain_long", key, lit(filterBytes))

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
